"""Console entry points (mirror of reference torch_darktable/scripts/)."""
