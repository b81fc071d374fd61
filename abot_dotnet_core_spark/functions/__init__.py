"""Column-expression and pandas-UDF libraries."""
