"""Host-side utilities for PyLC-TPU."""
