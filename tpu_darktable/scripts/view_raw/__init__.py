"""Interactive raw-file viewer/tuner (mirror of reference scripts/view_raw/)."""
