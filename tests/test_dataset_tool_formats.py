"""dataset_tool MNIST + LMDB ingestion (VERDICT round-1 missing #6) and the
pure-Python LMDB reader.

The LMDB fixtures are written byte-by-byte against the liblmdb on-disk
format (meta pages, leaf/branch node layout, overflow pages) -- the `lmdb`
binding is not available here, so the writer below doubles as an independent
spec check of utils/lmdb_reader.py.
"""

import gzip
import io
import json
import struct
import zipfile

import numpy as np
import PIL.Image
import pytest
from click.testing import CliRunner

from diff_sampler_tpu.cli.dataset_tool import main as dt_main
from diff_sampler_tpu.eval.dataset import ImageFolderDataset
from diff_sampler_tpu.utils.lmdb_reader import LMDBReader

PSIZE = 4096
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INVALID = 0xFFFFFFFFFFFFFFFF


def _page_header(pgno, flags, lower, upper, pages=None):
    if pages is not None:  # overflow: pb union holds the page count
        return struct.pack("<QHHI", pgno, 0, flags, pages)
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _leaf_page(pgno, items):
    """items: list of (key, value | ('bigdata', ovf_pgno, dsize))."""
    nodes = []
    for key, value in items:
        if isinstance(value, tuple):
            _tag, ovf_pgno, dsize = value
            data, nflags = struct.pack("<Q", ovf_pgno), F_BIGDATA
        else:
            data, nflags, dsize = value, 0, len(value)
        node = struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, nflags,
                           len(key)) + key + data
        if len(node) % 2:
            node += b"\x00"
        nodes.append(node)
    # pack nodes downward from the page end; ptr array keeps key order
    pos = PSIZE
    placed = []
    for node in reversed(nodes):
        pos -= len(node)
        placed.append(pos)
    placed = placed[::-1]
    blob = bytearray(PSIZE)
    for off, node in zip(placed, nodes):
        blob[off : off + len(node)] = node
    lower = 16 + 2 * len(nodes)
    upper = min(placed) if placed else PSIZE
    blob[0:16] = _page_header(pgno, P_LEAF, lower, upper)
    blob[16 : 16 + 2 * len(nodes)] = struct.pack(f"<{len(nodes)}H", *placed)
    return bytes(blob)


def _branch_page(pgno, children):
    """children: list of (key, child_pgno); first key may be b''."""
    nodes = []
    for key, child in children:
        lo, hi, fl = child & 0xFFFF, (child >> 16) & 0xFFFF, child >> 32
        node = struct.pack("<HHHH", lo, hi, fl, len(key)) + key
        if len(node) % 2:
            node += b"\x00"
        nodes.append(node)
    pos = PSIZE
    placed = []
    for node in reversed(nodes):
        pos -= len(node)
        placed.append(pos)
    placed = placed[::-1]
    blob = bytearray(PSIZE)
    for off, node in zip(placed, nodes):
        blob[off : off + len(node)] = node
    blob[0:16] = _page_header(pgno, P_BRANCH, 16 + 2 * len(nodes), min(placed))
    blob[16 : 16 + 2 * len(nodes)] = struct.pack(f"<{len(nodes)}H", *placed)
    return bytes(blob)


def _overflow_pages(pgno, data):
    npages = (16 + len(data) + PSIZE - 1) // PSIZE
    blob = bytearray(npages * PSIZE)
    blob[0:16] = _page_header(pgno, P_OVERFLOW, 0, 0, pages=npages)
    blob[16 : 16 + len(data)] = data
    return bytes(blob)


def _meta_page(pgno, txnid, root, entries, depth, last_pg):
    blob = bytearray(PSIZE)
    blob[0:16] = _page_header(pgno, P_META, 0, 0)
    meta = struct.pack("<II", 0xBEEFC0DE, 1)          # magic, version
    meta += struct.pack("<QQ", 0, 1 << 20)             # address, mapsize
    meta += struct.pack("<IHHQQQQQ", PSIZE, 0, 0, 0, 0, 0, 0, INVALID)  # free db
    meta += struct.pack("<IHHQQQQQ", 0, 0, depth, 0, 1, 0, entries, root)
    meta += struct.pack("<QQ", last_pg, txnid)
    blob[16 : 16 + len(meta)] = meta
    return bytes(blob)


def _write_lmdb(path, pages, root, entries, depth):
    """pages: dict pgno -> bytes (data pages, pgno >= 2)."""
    import os

    os.makedirs(path, exist_ok=True)
    last = max(pages) if pages else 2
    with open(os.path.join(path, "data.mdb"), "wb") as f:
        f.write(_meta_page(0, 0, INVALID, 0, 0, 1))    # stale meta
        f.write(_meta_page(1, 1, root, entries, depth, last))  # live meta
        pos = 2
        for pgno in sorted(pages):
            while pos < pgno:
                f.write(b"\x00" * PSIZE)
                pos += 1
            f.write(pages[pgno])
            pos += len(pages[pgno]) // PSIZE


def _png_bytes(arr):
    buf = io.BytesIO()
    PIL.Image.fromarray(arr).save(buf, format="png")
    return buf.getvalue()


def test_lmdb_reader_leaf_only(tmp_path):
    vals = {b"a": b"alpha", b"b": b"beta", b"c": b"x" * 100}
    page = _leaf_page(2, sorted(vals.items()))
    db = tmp_path / "toy_lmdb"
    _write_lmdb(str(db), {2: page}, root=2, entries=3, depth=1)
    with LMDBReader(str(db)) as r:
        assert len(r) == 3
        got = dict(r.items())
    assert got == vals


def test_lmdb_reader_branch_and_overflow(tmp_path):
    big = bytes(range(256)) * 40  # 10240 bytes -> 3 overflow pages
    leaf1 = _leaf_page(3, [(b"k1", b"v1"), (b"k2", ("bigdata", 5, len(big)))])
    leaf2 = _leaf_page(4, [(b"k3", b"v3")])
    branch = _branch_page(2, [(b"", 3), (b"k3", 4)])
    ovf = _overflow_pages(5, big)
    db = tmp_path / "tree_lmdb"
    _write_lmdb(str(db), {2: branch, 3: leaf1, 4: leaf2, 5: ovf},
                root=2, entries=3, depth=2)
    with LMDBReader(str(db)) as r:
        got = dict(r.items())
    assert got == {b"k1": b"v1", b"k2": big, b"k3": b"v3"}


def test_dataset_tool_lmdb_roundtrip(tmp_path):
    """LSUN-style LMDB of encoded images -> zip -> ImageFolderDataset."""
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(3)]
    items = sorted((f"key{i}".encode(), _png_bytes(im))
                   for i, im in enumerate(imgs))
    page = _leaf_page(2, items)
    db = tmp_path / "imgs_lmdb"
    _write_lmdb(str(db), {2: page}, root=2, entries=3, depth=1)

    dest = tmp_path / "out.zip"
    res = CliRunner().invoke(dt_main, [f"--source={db}", f"--dest={dest}"])
    assert res.exit_code == 0, res.output
    ds = ImageFolderDataset(str(dest))
    assert len(ds) == 3
    # PNG round trip is lossless; keys iterate in sorted order
    batch, _ = next(iter(ds.batches(3)))
    np.testing.assert_array_equal(np.sort(batch.ravel()),
                                  np.sort(np.stack(imgs).ravel()))


def test_dataset_tool_mnist_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    n = 4
    images = rng.randint(0, 255, (n, 28, 28), dtype=np.uint8)
    labels = np.asarray([3, 1, 4, 1], np.uint8)
    img_gz = tmp_path / "train-images-idx3-ubyte.gz"
    lab_gz = tmp_path / "train-labels-idx1-ubyte.gz"
    with gzip.open(img_gz, "wb") as f:
        f.write(b"\x00" * 16 + images.tobytes())
    with gzip.open(lab_gz, "wb") as f:
        f.write(b"\x00" * 8 + labels.tobytes())

    dest = tmp_path / "mnist.zip"
    res = CliRunner().invoke(dt_main, [f"--source={img_gz}", f"--dest={dest}"])
    assert res.exit_code == 0, res.output

    with zipfile.ZipFile(dest) as z:
        names = [x for x in z.namelist() if x.endswith(".png")]
        assert len(names) == n
        manifest = json.loads(z.read("dataset.json"))["labels"]
        assert [l for _f, l in manifest] == [3, 1, 4, 1]
        with z.open(sorted(names)[0]) as f:
            arr = np.array(PIL.Image.open(f))
    assert arr.shape == (32, 32)  # zero-padded 28 -> 32 (dataset_tool.py:186)
    np.testing.assert_array_equal(arr[2:30, 2:30], images[0])
    assert arr[:2].sum() == 0

    ds = ImageFolderDataset(str(dest))
    assert len(ds) == n


def test_dataset_tool_zip_input(tmp_path):
    """Existing zip re-ingestion (open_image_zip) with label manifest."""
    rng = np.random.RandomState(2)
    src = tmp_path / "src.zip"
    with zipfile.ZipFile(src, "w") as z:
        labels = []
        for i in range(2):
            arr = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
            z.writestr(f"img{i}.png", _png_bytes(arr))
            labels.append([f"img{i}.png", i])
        z.writestr("dataset.json", json.dumps({"labels": labels}))
    dest = tmp_path / "out.zip"
    res = CliRunner().invoke(dt_main, [f"--source={src}", f"--dest={dest}"])
    assert res.exit_code == 0, res.output
    with zipfile.ZipFile(dest) as z:
        manifest = json.loads(z.read("dataset.json"))["labels"]
    assert [l for _f, l in manifest] == [0, 1]


def test_dataset_tool_transforms(tmp_path):
    """--transform center-crop / center-crop-wide + WxH resolutions
    (dataset_tool.py make_transform :203-253)."""
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(3)
    # rectangular inputs: crop modes must handle both orientations
    for i, (h, w) in enumerate([(48, 64), (64, 48), (40, 40)]):
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(src / f"{i}.png")

    out = tmp_path / "cc.zip"
    r = CliRunner().invoke(dt_main, ["--source", str(src), "--dest", str(out),
                                     "--resolution", "32", "--transform",
                                     "center-crop"])
    assert r.exit_code == 0, r.output
    ds = ImageFolderDataset(str(out))
    assert len(ds) == 3 and ds[0][0].shape == (32, 32, 3)

    # center-crop-wide pads onto a WxW canvas and SKIPS too-small images
    out2 = tmp_path / "ccw.zip"
    r = CliRunner().invoke(dt_main, ["--source", str(src), "--dest", str(out2),
                                     "--resolution", "48x32", "--transform",
                                     "center-crop-wide"])
    assert r.exit_code == 0, r.output
    ds2 = ImageFolderDataset(str(out2))
    # (64,48) input: band=round(48*64/48)=64 >= 32 ok; (40,40): 48>40 -> skip
    assert len(ds2) == 2
    img = ds2[0][0]  # HWC
    assert img.shape == (48, 48, 3)
    assert img[:8].max() == 0 and img[-8:].max() == 0  # letterbox rows

    # --transform without --resolution is an error
    r = CliRunner().invoke(dt_main, ["--source", str(src), "--dest",
                                     str(tmp_path / "x.zip"), "--transform",
                                     "center-crop"])
    assert r.exit_code != 0
