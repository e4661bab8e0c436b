from deathmetal_datalake_spark.sql.ddl import create_ranking_view, register_zone_tables

__all__ = ["create_ranking_view", "register_zone_tables"]
