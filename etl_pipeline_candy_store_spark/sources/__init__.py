"""Sources & sinks: filesystem-native readers (CSV/JSON/Parquet) with
explicit schemas, plus pluggable JDBC wrappers so tests never need a
database server (the reference's CSV→MySQL→Spark hop is incidental
round-tripping, SURVEY §7)."""
