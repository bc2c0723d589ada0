"""Registry entries for the web-text pipeline + training-data operators
(dedup, similarity search, text analysis).  Grows alongside
packs_spark.pipeline / packs_spark.operators.
"""

from __future__ import annotations
