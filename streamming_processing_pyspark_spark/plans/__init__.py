"""Plan inspection: assert pushdown, broadcast, codegen properties."""
