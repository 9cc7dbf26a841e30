"""Host-side utilities: logging, metrics, profiling, torch checkpoint conversion."""
