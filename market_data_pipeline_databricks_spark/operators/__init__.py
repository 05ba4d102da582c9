"""Pipeline and training-data operators, all pure DataFrame transforms."""
