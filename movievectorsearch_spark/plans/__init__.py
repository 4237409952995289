"""Named query plans: the SURVEY.md §2 operator inventory as runnable
(spark_builder, duckdb_oracle_sql) pairs."""
