"""PySpark-native analytics engine with the query/data-processing capabilities of
the reference ``Chinthan23/TF-IDF-using-MapReduce`` (Hadoop MapReduce TF-IDF / POS
assignment), re-expressed Spark-first (DataFrame/SQL/Catalyst), plus the relational
and training-data-pipeline extensions described in SURVEY.md.

Design stance (SURVEY.md §7.0): every public operator is a composable
``DataFrame -> DataFrame`` function; expressions stay JVM-side (built-in
``pyspark.sql.functions`` / ``F.expr``) wherever possible so Catalyst/Tungsten
optimize and codegen them; Python UDFs exist only as documented pluggable slow
paths (e.g. an external stemmer/POS model), never in the default hot path.
"""

from tf_idf_using_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
