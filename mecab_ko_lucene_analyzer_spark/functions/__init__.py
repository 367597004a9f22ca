from .udfs import TOKEN_SCHEMA, analyze_udf, tokens_table

__all__ = ["TOKEN_SCHEMA", "analyze_udf", "tokens_table"]
