"""Pure-Python single-document extraction core (no Spark imports)."""
