"""Plan inspection helpers (explain / pushdown / codegen assertions)."""
