"""Block index arithmetic — unit vectors ported verbatim from the
reference's TestFourMcBlockIndex.java:41-84 (see FIXTURES.md F4)."""

from fourmc_spark.format.core import NOT_FOUND, BlockIndex

IDX = BlockIndex([100, 200, 300, 400])


def test_find_next_position():
    assert IDX.find_next_position(100) == 100  # exact hit
    assert IDX.find_next_position(110) == 200  # insertion point
    assert IDX.find_next_position(210) == 300
    assert IDX.find_next_position(400) == 400
    assert IDX.find_next_position(401) == NOT_FOUND
    assert IDX.find_next_position(0) == 100


def test_find_belonging_block_index():
    assert IDX.find_belonging_block_index(50) == NOT_FOUND  # before block 0
    assert IDX.find_belonging_block_index(100) == 0
    assert IDX.find_belonging_block_index(110) == 0
    assert IDX.find_belonging_block_index(210) == 1
    assert IDX.find_belonging_block_index(300) == 2
    assert IDX.find_belonging_block_index(350) == 2
    assert IDX.find_belonging_block_index(400) == 3
    assert IDX.find_belonging_block_index(450) == 3


def test_align_slice_start():
    assert IDX.align_slice_start(0, 350) == 0  # start==0 untouched
    assert IDX.align_slice_start(100, 350) == 100
    assert IDX.align_slice_start(110, 350) == 200
    assert IDX.align_slice_start(310, 350) == NOT_FOUND  # next block >= end
    assert IDX.align_slice_start(500, 600) == NOT_FOUND


def test_align_slice_end():
    assert IDX.align_slice_end(350, 550) == 400
    assert IDX.align_slice_end(250, 550) == 300
    assert IDX.align_slice_end(450, 550) == 550  # past last block -> file size
    assert IDX.align_slice_end(400, 550) == 400


def test_empty_index():
    idx = BlockIndex([])
    assert idx.is_empty()
    assert idx.find_next_position(0) == NOT_FOUND
    assert idx.find_belonging_block_index(0) == NOT_FOUND
