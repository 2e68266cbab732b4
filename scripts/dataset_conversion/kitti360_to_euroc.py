#!/usr/bin/env python
"""Convert KITTI-360 (images + OXTS IMU) to the EuRoC mav0 layout.

Equivalent of the reference's scripts/dataset_conversion/kitti360_to_euroc.py:
produces  <out>/mav0/cam0/data.csv (+ symlinked/copied images) and
<out>/mav0/imu0/data.csv with nanosecond timestamps, consumable by
configs/kitti360.yaml.

    python scripts/dataset_conversion/kitti360_to_euroc.py \
        --kitti /path/KITTI-360 --drive 2013_05_28_drive_0000 --out data/KITTI360
"""

from __future__ import annotations

import argparse
import os
import shutil


def parse_kitti_timestamp(line: str) -> float:
    """'2013-05-28 08:46:02.123456789' -> seconds since epoch."""
    import datetime as dt

    date, clock = line.strip().split(" ")
    base, frac = clock.rsplit(".", 1) if "." in clock else (clock, "0")
    t = dt.datetime.strptime(f"{date} {base}", "%Y-%m-%d %H:%M:%S")
    t = t.replace(tzinfo=dt.timezone.utc)
    return t.timestamp() + float(f"0.{frac}")


def convert(kitti_root: str, drive: str, out_root: str,
            link_images: bool = True) -> None:
    drive_dir = os.path.join(kitti_root, "data_2d_raw", f"{drive}_sync")
    img_dir = os.path.join(drive_dir, "image_00", "data_rect")
    ts_file = os.path.join(drive_dir, "image_00", "timestamps.txt")
    oxts_dir = os.path.join(kitti_root, "data_poses_oxts", "data_poses",
                            f"{drive}_sync", "oxts")
    if not os.path.isdir(oxts_dir):
        oxts_dir = os.path.join(drive_dir, "oxts")

    out = os.path.join(out_root, drive, "mav0")
    cam_out = os.path.join(out, "cam0")
    imu_out = os.path.join(out, "imu0")
    os.makedirs(os.path.join(cam_out, "data"), exist_ok=True)
    os.makedirs(imu_out, exist_ok=True)

    # Camera CSV + images.
    with open(ts_file) as f:
        cam_ts = [parse_kitti_timestamp(l) for l in f if l.strip()]
    images = sorted(os.listdir(img_dir))
    with open(os.path.join(cam_out, "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for t, name in zip(cam_ts, images):
            ns = int(round(t * 1e9))
            dst = os.path.join(cam_out, "data", f"{ns}.png")
            src = os.path.join(img_dir, name)
            if not os.path.exists(dst):
                if link_images:
                    os.symlink(os.path.abspath(src), dst)
                else:
                    shutil.copy2(src, dst)
            f.write(f"{ns},{ns}.png\n")

    # IMU CSV from OXTS (fields: ... wx wy wz at indices 17..19, ax ay az at
    # 11..13 in the 30-column OXTS format).
    oxts_ts_file = os.path.join(oxts_dir, "timestamps.txt")
    oxts_data = os.path.join(oxts_dir, "data")
    with open(oxts_ts_file) as f:
        imu_ts = [parse_kitti_timestamp(l) for l in f if l.strip()]
    entries = sorted(os.listdir(oxts_data))
    with open(os.path.join(imu_out, "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for t, name in zip(imu_ts, entries):
            vals = [float(x) for x in
                    open(os.path.join(oxts_data, name)).read().split()]
            ax, ay, az = vals[11:14]
            wx, wy, wz = vals[17:20]
            ns = int(round(t * 1e9))
            f.write(f"{ns},{wx},{wy},{wz},{ax},{ay},{az}\n")
    print(f"converted {drive} -> {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti", required=True)
    ap.add_argument("--drive", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--copy", action="store_true",
                    help="copy images instead of symlinking")
    args = ap.parse_args()
    convert(args.kitti, args.drive, args.out, link_images=not args.copy)


if __name__ == "__main__":
    main()
