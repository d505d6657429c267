"""Sources: deterministic span-corpus synthesis + table-format seam."""
