"""Model training subsystems (siamese metric learning)."""
