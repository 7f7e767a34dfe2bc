"""Operator modules. Each registers its queries in
:mod:`tf_datapipeline_spark.registry` at import time."""
