"""Engine operator modules (reusable logic behind the registered queries)."""
