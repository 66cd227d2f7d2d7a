"""Loss functions (populated in the losses milestone)."""
