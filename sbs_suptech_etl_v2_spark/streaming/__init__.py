"""streaming subpackage — see module docstrings."""
