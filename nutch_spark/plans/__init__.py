"""Query plans: the driver-facing query registry and plan inspection helpers."""
