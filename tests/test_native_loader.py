"""Native C++ loader tests: CSV parsing parity with the Python readers,
PNG/PGM decode correctness vs OpenCV, prefetching stream ordering, and the
full EurocDataset round trip on a synthetic on-disk sequence."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mobile_slam_tpu.io import dataset as ds
from mobile_slam_tpu.io import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native loader not built")


@pytest.fixture
def euroc_dir(tmp_path):
    base = tmp_path / "seq" / "mav0"
    (base / "imu0").mkdir(parents=True)
    (base / "cam0" / "data").mkdir(parents=True)
    rng = np.random.default_rng(0)
    with open(base / "imu0" / "data.csv", "w") as f:
        f.write("#ts,wx,wy,wz,ax,ay,az\n")
        for i in range(50):
            f.write(f"{int(1e9 + i * 5e6)},0.1,0.2,0.3,0.0,0.0,9.8\n")
        f.write("malformed,line,here\n")
    imgs = []
    with open(base / "cam0" / "data.csv", "w") as f:
        f.write("#ts,filename\n")
        for i in range(6):
            ns = int(1e9 + i * 5e7)
            img = rng.integers(0, 255, (48, 64), np.uint8)
            cv2.imwrite(str(base / "cam0" / "data" / f"{ns}.png"), img)
            f.write(f"{ns},{ns}.png\n")
            imgs.append(img)
        f.write(f"{int(2e9)},../../evil.png\n")
    return str(tmp_path / "seq"), imgs


class TestNativeParsers:
    def test_csv_parity_with_python(self, euroc_dir):
        root, _ = euroc_dir
        path = os.path.join(root, "mav0", "imu0", "data.csv")
        native = nl.parse_csv(path, 7)
        py = ds.load_imu_csv(path)
        assert len(native) == len(py.ts) == 50
        np.testing.assert_allclose(native[:, 0] * 1e-9, py.ts)
        np.testing.assert_allclose(native[:, 1:4], py.gyr)
        np.testing.assert_allclose(native[:, 4:7], py.acc)

    def test_image_csv_sanitizes(self, euroc_dir):
        root, _ = euroc_dir
        ts, names = nl.parse_image_csv(
            os.path.join(root, "mav0", "cam0", "data.csv"))
        assert len(names) == 6
        assert all(".." not in n for n in names)

    def test_png_decode_matches_cv2(self, euroc_dir):
        root, imgs = euroc_dir
        data_dir = os.path.join(root, "mav0", "cam0", "data")
        name = sorted(os.listdir(data_dir))[0]
        path = os.path.join(data_dir, name)
        want = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        got = nl.decode_image(path, 64, 48)
        assert np.array_equal(got, want)

    def test_pgm_decode(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (32, 40), np.uint8)
        path = str(tmp_path / "x.pgm")
        with open(path, "wb") as f:
            f.write(b"P5\n# comment\n40 32\n255\n")
            f.write(img.tobytes())
        got = nl.decode_image(path, 40, 32)
        assert np.array_equal(got, img)


class TestPrefetchStream:
    def test_ordered_stream(self, euroc_dir):
        root, imgs = euroc_dir
        data_dir = os.path.join(root, "mav0", "cam0", "data")
        names = sorted(os.listdir(data_dir))
        stream = nl.PrefetchingImageStream(data_dir, names, 64, 48,
                                           prefetch=2)
        seen = []
        for idx, frame in stream:
            seen.append(idx)
            assert frame.shape == (48, 64)
        assert seen == list(range(6))


class TestEurocDatasetNative:
    def test_dataset_roundtrip(self, euroc_dir):
        root, imgs = euroc_dir
        d = ds.EurocDataset(root, use_native=True)
        assert d._native
        assert len(d) == 6
        img0 = d.read_image(0)   # probe (cv2)
        img1 = d.read_image(1)   # native
        assert np.array_equal(img0, imgs[0])
        assert np.array_equal(img1, imgs[1])
        ts, acc, gyr = d.imu_between(1.0, 1.05)
        assert len(ts) == 10
