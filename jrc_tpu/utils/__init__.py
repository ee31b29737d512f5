"""Host-side utilities: CSV/npz logging, rolling statistics, timestamps."""
