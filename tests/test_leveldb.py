"""Pure-Python LevelDB reader (eco_tpu.data.leveldb) -- the classic Data
layer's second backend (reference util/db_leveldb.cpp + db.cpp GetDB).

The image has no leveldb library, so the fixtures write the on-disk
format directly (SSTables with prefix-compressed blocks, log-format
WAL/MANIFEST, CURRENT), following the same struct layout the reader
documents -- mirroring tests/test_lmdb.py's approach for LMDB.
"""

import struct

import numpy as np
import pytest

from eco_tpu.data.leveldb import (
    LevelDBReader,
    LevelDBSource,
    SSTable,
    crc32c,
    crc_mask,
    open_db,
    snappy_decompress,
)

T_DELETE, T_VALUE = 0, 1
BLOCK = 32768


def _varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _datum_bytes(channels, h, w, data, label):
    out = b""
    out += bytes([0x08]) + _varint(channels)
    out += bytes([0x10]) + _varint(h)
    out += bytes([0x18]) + _varint(w)
    out += bytes([0x22]) + _varint(len(data)) + data
    out += bytes([0x28]) + _varint(label)
    return out


def _snappy_literal(raw: bytes) -> bytes:
    """Valid snappy stream using only literal tags."""
    out = bytearray(_varint(len(raw)))
    pos = 0
    while pos < len(raw):
        chunk = raw[pos:pos + 60]
        out += bytes([(len(chunk) - 1) << 2]) + chunk
        pos += len(chunk)
    return bytes(out)


# ---------------------------------------------------------------------------
# fixture writers
# ---------------------------------------------------------------------------

def _ikey(user_key: bytes, seq: int, typ: int) -> bytes:
    return user_key + struct.pack("<Q", (seq << 8) | typ)


def _block(entries, restart_interval=4):
    """Prefix-compressed block (the SSTable block format)."""
    out = bytearray()
    restarts = []
    prev = b""
    for i, (key, value) in enumerate(entries):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            for a, b in zip(prev, key):
                if a != b:
                    break
                shared += 1
        out += _varint(shared) + _varint(len(key) - shared)
        out += _varint(len(value))
        out += key[shared:] + value
        prev = key
    for r in restarts:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts))
    return bytes(out)


def _write_sstable(path, records, *, snappy=False, block_entries=3):
    """records: [(user_key, seq, typ, value)] sorted by (key, -seq)."""
    data = bytearray()

    def emit_block(raw):
        if snappy:
            payload, comp = _snappy_literal(raw), 1
        else:
            payload, comp = raw, 0
        off = len(data)
        data.extend(payload)
        data.append(comp)
        data.extend(struct.pack(
            "<I", crc_mask(crc32c(payload + bytes([comp])))
        ))
        return off, len(payload)

    index = []
    for i in range(0, len(records), block_entries):
        chunk = records[i:i + block_entries]
        entries = [(_ikey(k, s, t), v) for k, s, t, v in chunk]
        off, size = emit_block(_block(entries))
        index.append((entries[-1][0], _varint(off) + _varint(size)))
    meta_off, meta_size = emit_block(_block([]))
    idx_off, idx_size = emit_block(_block(index))
    footer = bytearray()
    footer += _varint(meta_off) + _varint(meta_size)
    footer += _varint(idx_off) + _varint(idx_size)
    footer += bytes(40 - len(footer))
    footer += struct.pack("<Q", 0xDB4775248B80FB57)
    data += footer
    with open(path, "wb") as f:
        f.write(data)


def _log_file(records) -> bytes:
    """Log-format file; fragments records across 32 KiB blocks."""
    out = bytearray()
    for rec in records:
        pos = 0
        first = True
        while True:
            left = BLOCK - (len(out) % BLOCK)
            if left < 7:
                out += bytes(left)
                continue
            take = min(len(rec) - pos, left - 7)
            frag = rec[pos:pos + take]
            pos += take
            done = pos == len(rec)
            rtype = (1 if done else 2) if first else (4 if done else 3)
            out += struct.pack(
                "<IHB", crc_mask(crc32c(bytes([rtype]) + frag)),
                len(frag), rtype,
            ) + frag
            first = False
            if done:
                break
    return bytes(out)


def _write_batch(seq, ops) -> bytes:
    """ops: [(typ, key, value)] -> WriteBatch record."""
    out = bytearray(struct.pack("<QI", seq, len(ops)))
    for typ, key, value in ops:
        out.append(typ)
        out += _varint(len(key)) + key
        if typ == T_VALUE:
            out += _varint(len(value)) + value
    return bytes(out)


def _version_edit(files, log_number=0) -> bytes:
    """files: [(level, fno, size)]"""
    out = bytearray()
    out += _varint(1) + _varint(len(b"leveldb.BytewiseComparator"))
    out += b"leveldb.BytewiseComparator"
    if log_number:
        out += _varint(2) + _varint(log_number)
    out += _varint(3) + _varint(99)  # next_file
    out += _varint(4) + _varint(1000)  # last_seq
    for level, fno, size in files:
        out += _varint(7) + _varint(level) + _varint(fno) + _varint(size)
        small = _ikey(b"a", 1, T_VALUE)
        large = _ikey(b"z", 1, T_VALUE)
        out += _varint(len(small)) + small
        out += _varint(len(large)) + large
    return bytes(out)


def _write_db(tmp_path, tables, *, log_number=0, log_records=(),
              snappy=False):
    """tables: [[(key, seq, typ, value)]] -> a LevelDB dir."""
    d = tmp_path / "db"
    d.mkdir(exist_ok=True)
    files = []
    for i, recs in enumerate(tables):
        fno = 5 + i
        p = d / f"{fno:06d}.ldb"
        _write_sstable(str(p), recs, snappy=snappy)
        files.append((0, fno, p.stat().st_size))
    (d / "MANIFEST-000002").write_bytes(
        _log_file([_version_edit(files, log_number)])
    )
    (d / "CURRENT").write_text("MANIFEST-000002\n")
    if log_number:
        (d / f"{log_number:06d}.log").write_bytes(_log_file(log_records))
    return str(d)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_snappy_decompress_literals_and_copies():
    raw = b"hello world " * 40
    assert snappy_decompress(_snappy_literal(raw)) == raw
    # hand-built stream with an overlapping copy (RLE): "ab" * 10
    stream = _varint(20) + bytes([(2 - 1) << 2]) + b"ab"
    # copy tag kind=2 (2-byte offset): len=18 -> (18-1)<<2|2, offset 2
    stream += bytes([((18 - 1) << 2) | 2]) + struct.pack("<H", 2)
    assert snappy_decompress(stream) == b"ab" * 10
    with pytest.raises(ValueError):
        snappy_decompress(_varint(5) + bytes([((4 - 1) << 2)]) + b"abcd")


def test_sstable_roundtrip(tmp_path):
    recs = [
        (b"%04d" % i, 100 + i, T_VALUE, b"v%d" % i) for i in range(10)
    ]
    p = tmp_path / "000005.ldb"
    _write_sstable(str(p), recs)
    got = list(SSTable(str(p)).entries())
    assert [(k, s, t, v) for k, s, t, v in got] == recs


def test_sstable_snappy_blocks(tmp_path):
    recs = [(b"k%03d" % i, i + 1, T_VALUE, bytes(50) + b"%d" % i)
            for i in range(7)]
    p = tmp_path / "000006.ldb"
    _write_sstable(str(p), recs, snappy=True)
    got = list(SSTable(str(p)).entries())
    assert [k for k, *_ in got] == [r[0] for r in recs]
    assert got[3][3] == recs[3][3]


def test_reader_merge_shadow_delete(tmp_path):
    # older table: k0..k4 at seq 10..14; newer table overwrites k1 and
    # deletes k2 at higher sequences
    old = [(b"k%d" % i, 10 + i, T_VALUE, b"old%d" % i) for i in range(5)]
    new = [
        (b"k1", 50, T_VALUE, b"new1"),
        (b"k2", 51, T_DELETE, b""),
    ]
    path = _write_db(tmp_path, [old, new])
    items = dict(LevelDBReader(path).items())
    assert items == {
        b"k0": b"old0", b"k1": b"new1", b"k3": b"old3", b"k4": b"old4"
    }


def test_wal_replay_and_fragmentation(tmp_path):
    table = [(b"a", 1, T_VALUE, b"table_a"), (b"b", 2, T_VALUE, b"table_b")]
    big = bytes(range(256)) * 200  # 51200 B value -> spans two log blocks
    wal = [
        _write_batch(100, [(T_VALUE, b"a", b"wal_a"), (T_DELETE, b"b", b"")]),
        _write_batch(102, [(T_VALUE, b"c", big)]),
    ]
    path = _write_db(tmp_path, [table], log_number=7, log_records=wal)
    items = dict(LevelDBReader(path).items())
    assert items[b"a"] == b"wal_a"  # WAL shadows the table
    assert b"b" not in items  # WAL deletion hides the table value
    assert items[b"c"] == big  # FIRST/LAST reassembly across blocks


def test_leveldb_source_batches_sharded(tmp_path):
    arrays, recs = [], []
    for i in range(8):
        arr = (np.arange(24, dtype=np.uint8).reshape(2, 3, 4) + i)
        arrays.append(np.transpose(arr, (1, 2, 0)))
        recs.append((
            b"%08d" % i, i + 1, T_VALUE,
            _datum_bytes(2, 3, 4, arr.tobytes(), i + 10),
        ))
    path = _write_db(tmp_path, [recs])
    # world=2: rank 0 takes records 0,1 then 4,5 (cursor-offset stride)
    it = iter(LevelDBSource(path, batch_size=2, rank=0, world=2))
    b0 = next(it)
    np.testing.assert_array_equal(b0["data"][0], arrays[0])
    np.testing.assert_array_equal(b0["data"][1], arrays[1])
    assert list(b0["label"]) == [10, 11]
    b1 = next(it)
    assert list(b1["label"]) == [14, 15]
    # rank 1 starts at record 2; wrap-around works past the db end
    it1 = iter(LevelDBSource(path, batch_size=2, rank=1, world=2))
    assert list(next(it1)["label"]) == [12, 13]
    assert list(next(it1)["label"]) == [16, 17]
    assert list(next(it1)["label"]) == [12, 13]  # wrapped (8 % 8 -> 0, +2)


def test_open_db_dispatch(tmp_path):
    recs = [(b"x", 1, T_VALUE, _datum_bytes(1, 1, 1, b"\x07", 3))]
    lpath = _write_db(tmp_path, [recs])
    r = open_db(lpath)
    assert isinstance(r, LevelDBReader)
    d = next(r.datums())
    assert d.label == 3 and d.array()[0, 0, 0] == 7
    with pytest.raises(ValueError):
        open_db(lpath, backend="nosuch")
    (tmp_path / "plain").mkdir()
    with pytest.raises(ValueError):
        open_db(str(tmp_path / "plain"))  # neither backend sniffs


NET_DB = """
name: "tinydb"
layer { name: "data" type: "Data" top: "data" top: "label"
  data_param { source: "%s" batch_size: 4 backend: LEVELDB }
  transform_param { crop_size: 8 mirror: true
    mean_value: 104 mean_value: 117 mean_value: 123 }
  include { phase: TRAIN } }
layer { name: "data" type: "Data" top: "data" top: "label"
  data_param { source: "%s" batch_size: 4 backend: LEVELDB }
  transform_param { crop_size: 8
    mean_value: 104 mean_value: 117 mean_value: 123 }
  include { phase: TEST } }
layer { name: "conv1" type: "Convolution" bottom: "data" top: "conv1"
  convolution_param { num_output: 4 kernel_size: 3 stride: 1 pad: 1 } }
layer { name: "relu1" type: "ReLU" bottom: "conv1" top: "conv1" }
layer { name: "gp" type: "Pooling" bottom: "conv1" top: "gp"
  pooling_param { pool: AVE kernel_size: 8 stride: 1 } }
layer { name: "rsh" type: "Reshape" bottom: "gp" top: "feat"
  reshape_param { shape { dim: -1 dim: 4 } } }
layer { name: "fc" type: "InnerProduct" bottom: "feat" top: "fc"
  inner_product_param { num_output: 3 } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "fc" bottom: "label"
  top: "loss" }
layer { name: "top1" type: "Accuracy" bottom: "fc" bottom: "label"
  top: "top1" include { phase: TEST } }
"""

SOLVER_DB = """
net: "%s"
base_lr: 0.01
lr_policy: "fixed"
momentum: 0.9
max_iter: 2
iter_size: 1
display: 1
snapshot: 2
snapshot_prefix: "%s"
random_seed: 3
"""


def _datum_db(tmp_path, n=12, hw=12):
    rng = np.random.default_rng(1)
    recs = []
    for i in range(n):
        arr = rng.integers(0, 255, (3, hw, hw), dtype=np.uint8)
        recs.append((b"%08d" % i, i + 1, T_VALUE,
                     _datum_bytes(3, hw, hw, arr.tobytes(), i % 3)))
    return _write_db(tmp_path, [recs])


def test_db_pipeline_classic_transform(tmp_path):
    """DBPipeline: crop/mirror/mean on Datum records (data_transformer.cpp
    classic path), train vs test crop determinism."""
    from eco_tpu.data.db import DBDataConfig, DBPipeline
    from eco_tpu.data.transform import TransformConfig

    path = _datum_db(tmp_path)
    cfg = DBDataConfig(
        source=path, batch_size=4,
        transform=TransformConfig(
            crop_size=8, mirror=True, fix_crop=False, more_fix_crop=False,
            multi_scale=False, mean_values=(104.0, 117.0, 123.0),
        ),
    )
    b = DBPipeline(cfg, train=True, seed=0).next_batch()
    assert b["data"].shape == (4, 8, 8, 3)
    assert b["data"].dtype == np.float32
    assert list(b["label"]) == [0, 1, 2, 0]
    # test phase: center crop, deterministic across pipelines
    t1 = DBPipeline(cfg, train=False, seed=0).next_batch()
    t2 = DBPipeline(cfg, train=False, seed=99).next_batch()
    np.testing.assert_array_equal(t1["data"], t2["data"])
    # crop_size 0: full image, mean-subtracted only
    cfg0 = DBDataConfig(source=path, batch_size=2)
    b0 = DBPipeline(cfg0, train=False).next_batch()
    assert b0["data"].shape == (2, 12, 12, 3)


@pytest.mark.slow
def test_cli_train_classic_data_layer(tmp_path):
    """eco train on an unmodified classic-Caffe prototxt whose input is a
    LevelDB-backed Data layer (data_layer.cpp + db.cpp end to end)."""
    from eco_tpu.tools.cli import main

    path = _datum_db(tmp_path)
    net = tmp_path / "net.prototxt"
    net.write_text(NET_DB % (path, path))
    solver = tmp_path / "solver.prototxt"
    solver.write_text(SOLVER_DB % (net, tmp_path / "snap"))
    main(["train", "--solver", str(solver), "--net", str(net)])
    main(["test", "--net", str(net), "--iterations", "2",
          "--weights", str(tmp_path / "snap_iter_2.model.npz")])


def test_leveldb_source_drops_crc_after_first_epoch(tmp_path):
    """Wrap-around epochs re-read every block; their checksums were
    verified on epoch 1, so the pure-Python crc32c is dropped afterwards
    (it would otherwise re-verify a tens-of-GB table once per epoch)."""
    recs = [
        (b"%02d" % i, i + 1, T_VALUE,
         _datum_bytes(1, 2, 2, bytes([i] * 4), i))
        for i in range(4)
    ]
    path = _write_db(tmp_path, [recs])
    src = LevelDBSource(path, batch_size=2)
    assert all(t._verify for t in src.reader._tables)
    it = iter(src)
    labels = [list(next(it)["label"]) for _ in range(3)]  # 1.5 epochs
    assert labels == [[0, 1], [2, 3], [0, 1]]
    assert not any(t._verify for t in src.reader._tables)
    # corrupt-block detection still works on a FRESH source's first pass
    src2 = LevelDBSource(path, batch_size=2, verify_crc=True)
    assert all(t._verify for t in src2.reader._tables)
