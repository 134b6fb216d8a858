"""Query plans: driver-contract queries and the flagship pipeline."""
