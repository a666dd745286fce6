"""Query modules; each registers named queries into the shared registry."""
