"""htmlx — PySpark-native HTML main-content extraction engine.

A from-scratch reimplementation of the capabilities of rnb3ds/html
(cybergodev/html) as a Spark-first pipeline: a pure-Python per-document
extraction core (htmlx.core) driven by vectorized Arrow batches inside
mapInPandas (htmlx.spark).
"""

__version__ = "0.1.0"
