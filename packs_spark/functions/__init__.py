"""Scalar Column-expression library.

Every quality check the reference packs implement row-wise in pandas is
re-expressed here as a JVM-side ``pyspark.sql.Column`` so it stays inside
whole-stage codegen.  Pandas UDFs exist only where byte-parity with Python
``re``/``dateutil`` semantics is required (see ``packs_spark.pipeline.scrub``
and ``packs_spark.functions.datetime_parse``).
"""

from packs_spark.functions import numeric, patterns, text  # noqa: F401
