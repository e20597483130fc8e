"""plans subpackage — see module docstrings."""
