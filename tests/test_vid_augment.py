"""Window-consistent video augmentation tests."""

import random

import numpy as np

from tscd_tpu.data.vid import collate_window


class FakeDS:
    img_size = (64, 64)

    def load_frame(self, p):
        img = np.full((48, 64, 3), 100, np.uint8)
        img[10:20, 10:30] = 200
        annos = np.asarray([[10, 10, 30, 20, 2]], np.float32)
        return img, annos, (48, 64)

    def frame_index(self, p):
        return int(p)


def test_flip_consistent_across_window():
    random.seed(1)
    b = collate_window(FakeDS(), ["0", "1", "2"], augment=True,
                       flip_prob=1.0, hsv_prob=0.0)
    lab = b["labels"][0, 0]
    assert lab[0] == 2 and lab[1] == 34 and lab[3] == 54
    np.testing.assert_array_equal(b["labels"][1, 0], lab)
    np.testing.assert_array_equal(b["imgs"][0], b["imgs"][1])


def test_no_augment_identity():
    b = collate_window(FakeDS(), ["0", "1"], augment=False)
    lab = b["labels"][0, 0]
    assert lab[1] == 10 and lab[3] == 30
    assert b["time_embedding"].shape == (2, 256)


def test_hsv_changes_pixels_consistently():
    random.seed(0)
    np.random.seed(3)
    b = collate_window(FakeDS(), ["0", "1"], augment=True,
                       flip_prob=0.0, hsv_prob=1.0)
    base = collate_window(FakeDS(), ["0", "1"], augment=False)
    np.testing.assert_array_equal(b["imgs"][0], b["imgs"][1])
    # labels unchanged by HSV
    np.testing.assert_array_equal(b["labels"], base["labels"])
