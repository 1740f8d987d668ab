"""Driver-side state: partition manifest, packed index, checkpoint log."""
