"""sources subpackage — see module docstrings."""
