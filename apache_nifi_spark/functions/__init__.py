"""NiFi scalar-function surface (Expression Language + RecordPath) on Spark.

SURVEY.md §2.9 maps every EL/RecordPath function family to built-in
``pyspark.sql.functions`` — all JVM-side, whole-stage-codegen friendly; no
Python UDFs anywhere in this layer.
"""

from apache_nifi_spark.functions.el import *  # noqa: F401,F403
from apache_nifi_spark.functions.recordpath import *  # noqa: F401,F403
from apache_nifi_spark.functions.selectors import (  # noqa: F401
    compile_mongo_query,
    jms_selector,
    mqtt_filter_regex,
    mqtt_topic_matches,
)
