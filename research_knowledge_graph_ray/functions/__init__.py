"""Pure, deterministic scalar/vector functions (no Ray dependency)."""
