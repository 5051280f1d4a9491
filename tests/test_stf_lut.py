"""STF raw->LUT conversion vs the reference's loop semantics."""

import numpy as np

from hrfuser_tpu.data.stf_lut import (COMP_KNEEPOINTS, DAYTIME_KNEEPOINTS,
                                      DECOMP_KNEEPOINTS, GATED_KNEEPOINTS,
                                      NIGHTTIME_KNEEPOINTS, decompand_lut,
                                      tone_lut)


def _naive_decompand(kneepoints):
    """Direct transcription of `decompand.py` loadKneepoints +
    create_decompand_lut."""
    x1 = y1 = -1
    segs = {}
    for x2, y2 in kneepoints:
        segs[x2] = (y2, (y2 - y1) / (x2 - x1))
        x1, y1 = x2, y2
    out, src_min, dst_min = [], 0, 0
    for src_max in sorted(segs):
        dst_max, comp = segs[src_max]
        for src in range(src_min, src_max + 1):
            v = (src - src_min) * comp + dst_min
            out.append(min(v, dst_max))
        src_min, dst_min = src_max + 1, dst_max + 1
    return np.asarray(out, np.uint16)


def _naive_tone(kneepoints, bit_depth=16, start_point=(0, 0)):
    """Direct transcription of `process.py create_lut_from_kneepoints`."""
    size = 2 ** bit_depth
    pts = [list(start_point)] + [list(p) for p in kneepoints] + \
        [[size, size]]
    lut = np.zeros((size,), np.uint16)
    for (ax, ay), (bx, by) in zip(pts[:-1], pts[1:]):
        m = (by - ay) / float(bx - ax)
        c = ay - m * ax
        for x in range(ax, min(bx, size)):
            lut[x] = np.uint16(np.floor(m * x + c))
    return lut


def test_decompand_luts_match_reference_semantics():
    for kps in (DECOMP_KNEEPOINTS, COMP_KNEEPOINTS):
        got = decompand_lut(kps)
        ref = _naive_decompand(kps)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref)


def test_decompand_covers_12bit_range():
    lut = decompand_lut(DECOMP_KNEEPOINTS)
    assert len(lut) == 3968            # 12-bit companded domain
    assert lut[0] == 0
    assert lut[1023] == 1023           # identity toe
    # last segment slope 64 from (3455, 32767): (3967-3456)*64 + 32768
    assert lut[-1] == 65472


def test_tone_luts_match_reference_semantics():
    for kps, bits in ((DAYTIME_KNEEPOINTS, 16),
                      (NIGHTTIME_KNEEPOINTS, 16),
                      (GATED_KNEEPOINTS, 10)):
        got = tone_lut(kps, bit_depth=bits)
        ref = _naive_tone(kps, bit_depth=bits)
        np.testing.assert_array_equal(got, ref)
        assert got.shape == (2 ** bits,)
        # monotone non-decreasing tone curves
        assert (np.diff(got.astype(np.int64)) >= 0).all()


def test_split_loader(tmp_path):
    from hrfuser_tpu.data.stf_io import load_split, load_weather_splits
    (tmp_path / 'dense_fog_day.txt').write_text(
        '2018-02-03_21-04-07,00100\n2018-02-03_21-04-07,00200\n')
    (tmp_path / 'dense_fog_night.txt').write_text(
        '2018-10-29_16-34-16,00050\n')
    frames = load_split(str(tmp_path / 'dense_fog_day.txt'))
    assert frames == ['2018-02-03_21-04-07_00100',
                      '2018-02-03_21-04-07_00200']
    ws = load_weather_splits(str(tmp_path))
    assert ws['dense_fog'] == ['2018-02-03_21-04-07_00100',
                               '2018-02-03_21-04-07_00200',
                               '2018-10-29_16-34-16_00050']
    assert ws['snow'] == []
