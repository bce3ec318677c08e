"""Dump the shipped camera settings (mirror of reference
scripts/dump_camera_settings.py)."""

from __future__ import annotations

import argparse

from tpu_darktable.pipeline.camera_settings import load_camera_settings_from_dir


def main():
    parser = argparse.ArgumentParser(description='Dump camera settings')
    parser.add_argument('--camera', type=str, default=None, help='Only this camera')
    args = parser.parse_args()

    settings = load_camera_settings_from_dir()
    for name, cam in settings.items():
        if args.camera and name != args.camera:
            continue
        print(f'=== {name} ===')
        print(cam.model_dump_json(indent=2))
        print()


if __name__ == '__main__':
    main()
