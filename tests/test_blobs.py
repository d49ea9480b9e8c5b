"""blob_stats: 4-connected component statistics over decoded pixels,
pinned against an independent BFS flood-fill reference."""

from collections import deque

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ksj2gp_spark.formats.imagecodec import encode_image, make_test_image
from ksj2gp_spark.operators.images import blob_stats


def _ref_blobs(plane: np.ndarray, threshold: int):
    mask = plane >= threshold
    seen = np.zeros_like(mask)
    sizes = []
    h, w = mask.shape
    for sy in range(h):
        for sx in range(w):
            if not mask[sy, sx] or seen[sy, sx]:
                continue
            q, size = deque([(sy, sx)]), 0
            seen[sy, sx] = True
            while q:
                y, x = q.popleft()
                size += 1
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if (
                        0 <= ny < h
                        and 0 <= nx < w
                        and mask[ny, nx]
                        and not seen[ny, nx]
                    ):
                        seen[ny, nx] = True
                        q.append((ny, nx))
            sizes.append(size)
    return int(mask.sum()), len(sizes), max(sizes) if sizes else 0


def _df(spark, planes):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": [f"b{i}" for i in range(len(planes))],
                "bytes": [encode_image(p, "png") for p in planes],
                "fmt": ["png"] * len(planes),
            }
        )
    )


class TestBlobStats:
    def test_matches_bfs_on_fixture_images(self, spark):
        planes = [
            make_test_image(i, 8 + i % 9, 8 + (i * 3) % 9)[:, :, 1]
            for i in range(1, 40)
        ]
        out = (
            blob_stats(_df(spark, planes))
            .toPandas()
            .set_index("image_id")
        )
        for i, p in enumerate(planes):
            mp, nb, lg = _ref_blobs(p, 128)
            r = out.loc[f"b{i}"]
            assert (r.mask_pixels, r.n_blobs, r.largest_blob) == (mp, nb, lg)

    def test_hand_built_shapes(self, spark):
        # two diagonal pixels do NOT join under 4-connectivity
        a = np.zeros((4, 4), dtype=np.uint8)
        a[0, 0] = 255
        a[1, 1] = 255
        # an L-shaped blob plus an isolated pixel
        b = np.zeros((4, 4), dtype=np.uint8)
        b[0, 0] = b[1, 0] = b[1, 1] = 200
        b[3, 3] = 200
        # all-background
        c = np.full((3, 3), 10, dtype=np.uint8)
        out = (
            blob_stats(_df(spark, [a, b, c]))
            .toPandas()
            .set_index("image_id")
        )
        assert tuple(out.loc["b0"][["mask_pixels", "n_blobs", "largest_blob"]]) == (2, 2, 1)
        assert tuple(out.loc["b1"][["mask_pixels", "n_blobs", "largest_blob"]]) == (4, 2, 3)
        assert tuple(out.loc["b2"][["mask_pixels", "n_blobs", "largest_blob"]]) == (0, 0, 0)

    def test_mixed_sizes_one_batch(self, spark):
        # batch-tensor padding must not leak labels across images
        planes = [
            np.full((2, 2), 255, dtype=np.uint8),
            np.full((16, 3), 255, dtype=np.uint8),
            np.eye(6, dtype=np.uint8) * 255,
        ]
        out = (
            blob_stats(_df(spark, planes)).toPandas().set_index("image_id")
        )
        assert tuple(out.loc["b0"][["n_blobs", "largest_blob"]]) == (1, 4)
        assert tuple(out.loc["b1"][["n_blobs", "largest_blob"]]) == (1, 48)
        assert tuple(out.loc["b2"][["n_blobs", "largest_blob"]]) == (6, 1)

    def test_threshold_and_validation(self, spark):
        p = np.array([[100, 200]], dtype=np.uint8)
        df = _df(spark, [p])
        out = blob_stats(df, threshold=150).toPandas()
        assert out.mask_pixels[0] == 1
        with pytest.raises(ValueError, match="threshold"):
            blob_stats(df, threshold=300)

    def test_undecodable_skipped(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "image_id": ["ok", "bad"],
                    "bytes": [
                        encode_image(
                            np.full((3, 3), 255, dtype=np.uint8), "png"
                        ),
                        b"junk",
                    ],
                    "fmt": ["png", "png"],
                }
            )
        )
        out = blob_stats(df).toPandas()
        assert list(out.image_id) == ["ok"]
