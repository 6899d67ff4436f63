"""Spark job layer: schemas, mapInPandas extraction stage, table IO."""
