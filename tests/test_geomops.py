"""Batch 145: segment intersection + rectangle overlap — brute-force
python mirrors certify the grid-bucketed counts equal the all-pairs
ground truth (candidate completeness), and the exact-integer overlap
area matches."""

import glob
import hashlib

import pandas as pd

SF = "/root/testdata/sf0.001"


def _keys(name, col):
    files = sorted(glob.glob(f"{SF}/{name}.parquet")) or sorted(
        glob.glob(f"{SF}/{name}.parquet/*.parquet")
    )
    return sorted(
        int(k)
        for k in pd.concat(
            pd.read_parquet(f, columns=[col]) for f in files
        )[col]
    )


def _h32(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _seg(k):
    from ocr_to_csv_spark.functions.geomops import G_UNIVERSE, SEG_OFF

    x1 = _h32(f"sgx|{k}") % G_UNIVERSE + SEG_OFF
    y1 = _h32(f"sgy|{k}") % G_UNIVERSE + SEG_OFF
    x2 = x1 + (_h32(f"sgu|{k}") % SEG_OFF - (SEG_OFF - 1) // 2)
    y2 = y1 + (_h32(f"sgv|{k}") % SEG_OFF - (SEG_OFF - 1) // 2)
    return x1, y1, x2, y2


def _intersects(s, t):
    ax1, ay1, ax2, ay2 = s
    bx1, by1, bx2, by2 = t

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    bbox = (
        min(ax1, ax2) <= max(bx1, bx2)
        and min(bx1, bx2) <= max(ax1, ax2)
        and min(ay1, ay2) <= max(by1, by2)
        and min(by1, by2) <= max(ay1, ay2)
    )
    return d1 * d2 <= 0 and d3 * d4 <= 0 and bbox


def test_segment_intersect_matches_bruteforce(spark):
    from ocr_to_csv_spark.functions.geomops import q_segment_intersect

    keys = _keys("supplier", "s_suppkey")
    segs = [_seg(k) for k in keys]
    truth = sum(
        1
        for i in range(len(segs))
        for j in range(i + 1, len(segs))
        if _intersects(segs[i], segs[j])
    )
    r = q_segment_intersect(spark, SF).collect()[0]
    assert r.n_segments == len(segs)
    # grid candidates are complete: bucketed count == all-pairs truth
    assert r.n_intersect == truth
    assert r.n_cand <= len(segs) * (len(segs) - 1) // 2


def test_rect_overlap_matches_bruteforce(spark):
    from ocr_to_csv_spark.functions.geomops import (
        G_UNIVERSE, RECT_EXT, q_rect_overlap,
    )

    keys = _keys("part", "p_partkey")
    rects = []
    for k in keys:
        x = _h32(f"rcx|{k}") % G_UNIVERSE
        y = _h32(f"rcy|{k}") % G_UNIVERSE
        w = _h32(f"rcw|{k}") % RECT_EXT + 1
        h = _h32(f"rch|{k}") % RECT_EXT + 1
        rects.append((x, y, x + w, y + h))
    n_pairs = 0
    area = 0
    for i in range(len(rects)):
        ax1, ay1, ax2, ay2 = rects[i]
        for j in range(i + 1, len(rects)):
            bx1, by1, bx2, by2 = rects[j]
            ox1, oy1 = max(ax1, bx1), max(ay1, by1)
            ox2, oy2 = min(ax2, bx2), min(ay2, by2)
            if ox1 <= ox2 and oy1 <= oy2:
                n_pairs += 1
                area += (ox2 - ox1) * (oy2 - oy1)
    r = q_rect_overlap(spark, SF).collect()[0]
    assert (r.n_rects, r.n_pairs, r.total_area) == (
        len(rects), n_pairs, area,
    )
