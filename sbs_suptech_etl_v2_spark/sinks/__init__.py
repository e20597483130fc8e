"""sinks subpackage — see module docstrings."""
