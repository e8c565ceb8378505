"""Query definition modules; importing them registers queries into
map_reduce_library_spark.queries.QUERIES / ORACLES."""
