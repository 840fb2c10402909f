"""Pure Column-expression libraries (no Python UDFs in the parity path)."""
