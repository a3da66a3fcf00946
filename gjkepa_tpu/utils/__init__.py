"""Host-side utilities: hull preprocessing, fixtures."""
