"""Crop arithmetic tests, ported from ``vid_dup_finder_common/src/crop.rs:198-366``."""

from vid_dup_finder_lib_tpu import Crop


def test_as_view_args_nocrop():
    assert Crop.from_edge_offsets((100, 100), 0, 0, 0, 0).as_view_args() == (
        0, 0, 100, 100,
    )


def test_as_view_args_1pix_left():
    assert Crop.from_edge_offsets((100, 100), 1, 0, 0, 0).as_view_args() == (
        1, 0, 99, 100,
    )


def test_as_view_args_1pix_right():
    assert Crop.from_edge_offsets((100, 100), 0, 1, 0, 0).as_view_args() == (
        0, 0, 99, 100,
    )


def test_as_view_args_1pix_top():
    assert Crop.from_edge_offsets((100, 100), 0, 0, 1, 0).as_view_args() == (
        0, 1, 100, 99,
    )


def test_as_view_args_1pix_bot():
    assert Crop.from_edge_offsets((100, 100), 0, 0, 0, 1).as_view_args() == (
        0, 0, 100, 99,
    )


def test_as_view_args_four_values():
    assert Crop.from_edge_offsets((100, 100), 25, 25, 25, 25).as_view_args() == (
        25, 25, 50, 50,
    )


def test_as_view_args_four_more():
    assert Crop.from_edge_offsets((768, 432), 96, 96, 0, 0).as_view_args() == (
        96, 0, 576, 432,
    )


def test_from_offset_and_dims():
    crop = Crop.from_topleft_and_dims((100, 100), 11, 12, 13, 14)
    assert crop.as_view_args() == (11, 12, 13, 14)


def test_enumerate_coords_nocrop():
    crop = Crop.from_edge_offsets((3, 3), 0, 0, 0, 0)
    assert len(list(crop.enumerate_coords())) == 9
    assert len(list(crop.enumerate_coords_excluded())) == 0


def test_enumerate_coords_1pixinthemiddle():
    crop = Crop.from_edge_offsets((3, 3), 1, 1, 1, 1)
    assert list(crop.enumerate_coords()) == [(1, 1)]
    exp = sorted(
        [(0, 0), (1, 0), (2, 0), (0, 1), (2, 1), (0, 2), (1, 2), (2, 2)]
    )
    assert sorted(crop.enumerate_coords_excluded()) == exp


def test_enumerate_coords_1pixinthetop():
    crop = Crop.from_edge_offsets((3, 3), 1, 1, 0, 2)
    assert list(crop.enumerate_coords()) == [(1, 0)]
    exp = sorted(
        [(0, 0), (2, 0), (0, 1), (1, 1), (2, 1), (0, 2), (1, 2), (2, 2)]
    )
    assert sorted(crop.enumerate_coords_excluded()) == exp


def test_enumerate_coords_1pixintheright():
    crop = Crop.from_edge_offsets((3, 3), 2, 0, 2, 0)
    assert crop == Crop.from_topleft_and_dims((3, 3), 2, 2, 1, 1)
    assert list(crop.enumerate_coords()) == [(2, 2)]
    exp = sorted(
        [(0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (2, 1), (0, 2), (1, 2)]
    )
    assert sorted(crop.enumerate_coords_excluded()) == exp


def test_union_takes_loosest():
    a = Crop.from_edge_offsets((100, 100), 10, 20, 30, 40)
    b = Crop.from_edge_offsets((100, 100), 15, 5, 35, 25)
    assert a.union(b) == Crop.from_edge_offsets((100, 100), 10, 5, 30, 25)


def test_eroded():
    c = Crop.from_edge_offsets((10, 10), 0, 0, 0, 0)
    e = c.eroded()
    assert e == Crop((10, 10), 1, 1, 1, 1)
    tight = Crop.from_edge_offsets((4, 10), 1, 1, 0, 0)
    assert tight.eroded() is None


def test_is_uncropped():
    assert Crop.from_edge_offsets((10, 10), 0, 0, 0, 0).is_uncropped()
    assert not Crop.from_edge_offsets((10, 10), 1, 0, 0, 0).is_uncropped()
