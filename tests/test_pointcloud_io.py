"""readers.pcd / readers.ply / writers round trips."""

import struct

import pytest

from pdal_spark.sources import pointcloud as pc


def _write(p, text):
    p.write_text(text)
    return str(p)


def test_read_pcd_ascii_and_roundtrip(spark, tmp_path):
    body = "\n".join(f"{i * 0.5} {i * -1.0} {i}" for i in range(5))
    _write(tmp_path / "a.pcd", f"""# comment
VERSION 0.7
FIELDS x y label
SIZE 8 8 4
TYPE F F I
COUNT 1 1 1
WIDTH 5
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS 5
DATA ascii
{body}
""")
    df = pc.read_pcd(spark, str(tmp_path / "a.pcd"))
    assert df.columns == ["x", "y", "label"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "double", "double", "int"]
    rows = {r.label: (r.x, r.y) for r in df.collect()}
    assert rows[3] == (1.5, -3.0)
    # round trip through the writer
    out = tmp_path / "out_pcd"
    nfiles = pc.write_pcd(df.repartition(2), str(out))
    assert nfiles >= 1
    back = pc.read_pcd(spark, str(out))
    assert sorted((r.x, r.y, r.label) for r in back.collect()) == \
        sorted((i * 0.5, i * -1.0, i) for i in range(5))


def test_read_pcd_binary(spark, tmp_path):
    hdr = ("VERSION 0.7\nFIELDS x i\nSIZE 4 2\nTYPE F U\n"
           "COUNT 1 1\nWIDTH 3\nHEIGHT 1\nPOINTS 3\nDATA binary\n")
    data = b"".join(struct.pack("<fH", 1.5 * k, 60000 + k)
                    for k in range(3))
    (tmp_path / "b.pcd").write_bytes(hdr.encode() + data)
    df = pc.read_pcd(spark, str(tmp_path / "b.pcd"))
    # u2 widens to int
    assert dict(zip(df.columns,
                    (f.dataType.simpleString()
                     for f in df.schema.fields))) == {
        "x": "float", "i": "int"}
    got = sorted((round(r.x, 3), r.i) for r in df.collect())
    assert got == [(0.0, 60000), (1.5, 60001), (3.0, 60002)]


def test_read_ply_ascii_skips_faces(spark, tmp_path):
    _write(tmp_path / "m.ply", """ply
format ascii 1.0
comment made by hand
element vertex 3
property double x
property double y
property uchar cls
element face 1
property list uchar int vertex_indices
end_header
0.0 0.0 1
1.0 0.0 2
0.0 1.0 3
3 0 1 2
""")
    df = pc.read_ply(spark, str(tmp_path / "m.ply"), with_path=True)
    rows = sorted((r.x, r.y, r.cls) for r in df.collect())
    assert rows == [(0.0, 0.0, 1), (0.0, 1.0, 3), (1.0, 0.0, 2)]
    assert df.select("file_path").distinct().count() == 1


def test_read_ply_binary_le(spark, tmp_path):
    hdr = ("ply\nformat binary_little_endian 1.0\n"
           "element vertex 2\nproperty float x\nproperty int v\n"
           "end_header\n")
    data = struct.pack("<fi", 2.5, -7) + struct.pack("<fi", 3.5, 9)
    (tmp_path / "b.ply").write_bytes(hdr.encode() + data)
    df = pc.read_ply(spark, str(tmp_path / "b.ply"))
    assert sorted((round(r.x, 2), r.v) for r in df.collect()) == [
        (2.5, -7), (3.5, 9)]


def test_write_ply_roundtrip_and_schema_mismatch(spark, tmp_path):
    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 4.0)], ["x", "y"])
    out = tmp_path / "out_ply"
    assert pc.write_ply(df.coalesce(1), str(out)) == 1
    back = pc.read_ply(spark, str(out))
    assert sorted((r.x, r.y) for r in back.collect()) == [
        (1.0, 2.0), (3.0, 4.0)]
    # mixing files with different schemas errors loudly
    _write(tmp_path / "out_ply" / "alien.ply", """ply
format ascii 1.0
element vertex 1
property float q
end_header
1.0
""")
    with pytest.raises(Exception, match="schema differs"):
        pc.read_ply(spark, str(out)).collect()


def test_pcd_count_gt1_rejected(spark, tmp_path):
    _write(tmp_path / "c.pcd", """VERSION 0.7
FIELDS x
SIZE 4
TYPE F
COUNT 3
WIDTH 1
HEIGHT 1
POINTS 1
DATA ascii
1 2 3
""")
    with pytest.raises(Exception, match="COUNT"):
        pc.read_pcd(spark, str(tmp_path / "c.pcd"))


def test_read_sbet_records_and_angles(spark, tmp_path):
    import numpy as np

    rec = np.arange(34, dtype="<f8").reshape(2, 17)
    rec[:, 1] = [0.85, 0.86]   # lat rad
    rec[:, 2] = [0.04, 0.05]   # lon rad
    (tmp_path / "t.sbet").write_bytes(rec.tobytes())
    df = pc.read_sbet(spark, str(tmp_path / "t.sbet"),
                      angles_as_degrees=False)
    assert df.columns == pc.SBET_DIMS
    rows = sorted(df.collect(), key=lambda r: r.gps_time)
    assert rows[0].y == 0.85 and rows[0].x == 0.04
    assert rows[1].z == rec[1, 3]
    # degrees mode converts the angular dims only
    deg = sorted(pc.read_sbet(spark, str(tmp_path / "t.sbet"))
                 .collect(), key=lambda r: r.gps_time)
    import math
    assert deg[0].y == pytest.approx(math.degrees(0.85))
    assert deg[0].z == rows[0].z            # linear dim untouched
    # truncated file errors loudly
    (tmp_path / "bad.sbet").write_bytes(rec.tobytes()[:100])
    with pytest.raises(Exception, match="17-double"):
        pc.read_sbet(spark, str(tmp_path / "bad.sbet")).collect()


def test_read_pts_arities(spark, tmp_path):
    (tmp_path / "a.pts").write_text(
        "3\n1.0 2.0 3.0 100\n4.0 5.0 6.0 200\n7.0 8.0 9.0 300\n")
    df = pc.read_pts(spark, str(tmp_path / "a.pts"))
    assert df.columns == ["x", "y", "z", "intensity"]
    assert sorted(r.intensity for r in df.collect()) == [100, 200, 300]
    (tmp_path / "b.pts").write_text("1\n1.0 2.0\n")
    with pytest.raises(Exception, match="field count"):
        pc.read_pts(spark, str(tmp_path / "b.pts"))


def test_read_obj_vertices_only(spark, tmp_path):
    (tmp_path / "m.obj").write_text(
        "# mesh\nv 1.0 2.0 3.0\nvn 0 0 1\nvt 0.5 0.5\n"
        "v 4.0 5.0 6.0\nf 1//1 2//1 1//1\n")
    df = pc.read_obj(spark, str(tmp_path / "m.obj"))
    assert sorted((r.x, r.y, r.z) for r in df.collect()) == [
        (1.0, 2.0, 3.0), (4.0, 5.0, 6.0)]


def test_sbet_feeds_georeference(spark, tmp_path):
    import numpy as np
    from pdal_spark.operators.transform import georeference

    rec = np.zeros((3, 17))
    rec[:, 0] = [0.0, 10.0, 20.0]          # gps_time
    rec[:, 1] = [0.85, 0.8501, 0.8503]     # lat rad
    rec[:, 2] = [0.042, 0.0421, 0.0423]    # lon rad
    rec[:, 3] = [100.0, 105.0, 108.0]      # z
    rec[:, 7:11] = 0.01                    # roll/pitch/az/wander
    (tmp_path / "traj.sbet").write_bytes(
        rec.astype("<f8").tobytes())
    traj = pc.read_sbet(spark, str(tmp_path / "traj.sbet"),
                        angles_as_degrees=False)
    pts = spark.createDataFrame(
        [(1, 5.0, 1.0, 2.0, 3.0)],
        ["pid", "gps_time", "x", "y", "z"])
    out = georeference(pts, traj, traj_time="gps_time").collect()
    assert len(out) == 1
    # lands near the WGS84 surface point of the trajectory
    import math
    r = math.sqrt(out[0].x ** 2 + out[0].y ** 2 + out[0].z ** 2)
    assert 6.3e6 < r < 6.5e6


def test_read_smrmsg(spark, tmp_path):
    import numpy as np

    rec = np.arange(20, dtype="<f8").reshape(2, 10)
    (tmp_path / "a.smrmsg").write_bytes(rec.tobytes())
    df = pc.read_smrmsg(spark, str(tmp_path / "a.smrmsg"))
    assert df.columns == pc.SMRMSG_DIMS
    rows = sorted(df.collect(), key=lambda r: r.gps_time)
    assert rows[1].heading_rms == 19.0


def test_write_gltf_valid_glb(spark, tmp_path):
    import json
    import struct

    from pdal_spark.operators.delaunay import delaunay_tin

    rows = [(k, float(k % 3) + 0.1 * k, float(k // 3), 0.5 * k)
            for k in range(9)]
    pts = spark.createDataFrame(rows, ["pid", "lon", "lat", "z"])
    tris = delaunay_tin(pts)
    n = pc.write_gltf(tris.coalesce(1), pts, str(tmp_path / "glb"))
    assert n == 1
    files = list((tmp_path / "glb").glob("*.glb"))
    assert len(files) >= 1
    buf = files[0].read_bytes()
    magic, ver, total = struct.unpack_from("<III", buf, 0)
    assert magic == 0x46546C67 and ver == 2 and total == len(buf)
    jlen, jtype = struct.unpack_from("<II", buf, 12)
    assert jtype == 0x4E4F534A
    j = json.loads(buf[20:20 + jlen])
    assert j["asset"]["version"] == "2.0"
    ntri = tris.count()
    assert j["accessors"][0]["count"] == ntri * 3
    assert j["accessors"][1]["count"] == 9
    blen, btype = struct.unpack_from("<II", buf, 20 + jlen)
    assert btype == 0x004E4942
    assert 20 + jlen + 8 + blen == len(buf)
    # indices in range
    off = 28 + jlen
    import numpy as np
    idx = np.frombuffer(buf, dtype="<u4", count=ntri * 3, offset=off)
    assert idx.max() < 9


def test_read_ilvis2_mappings(spark, tmp_path):
    # 2 records: first has low==high elev (ALL emits 1 point),
    # second differs (ALL emits 2); longitude 350 normalizes to -10
    (tmp_path / "l.txt").write_text(
        "1 10 100.5 350.0 1.0 5.0 350.1 1.1 5.0 350.2 1.2 5.0\n"
        "2 20 101.5 10.0 2.0 7.0 10.1 2.1 7.0 10.2 2.2 9.0\n")
    allpts = pc.read_ilvis2(spark, str(tmp_path / "l.txt"))
    assert allpts.count() == 3
    low = pc.read_ilvis2(spark, str(tmp_path / "l.txt"), "LOW")
    rows = {r.lvis_lfid: r for r in low.collect()}
    assert rows[1].x == pytest.approx(-9.9)
    assert rows[1].z == 5.0
    high = pc.read_ilvis2(spark, str(tmp_path / "l.txt"), "HIGH")
    assert {r.z for r in high.collect()} == {5.0, 9.0}
    with pytest.raises(ValueError, match="mapping"):
        pc.read_ilvis2(spark, str(tmp_path / "l.txt"), "MID")


def test_write_sbet_roundtrip(spark, tmp_path):
    import numpy as np

    rec = np.random.default_rng(7).uniform(-1, 1, (4, 17))
    rec[:, 0] = [1.0, 2.0, 3.0, 4.0]
    (tmp_path / "in.sbet").write_bytes(rec.astype("<f8").tobytes())
    df = pc.read_sbet(spark, str(tmp_path / "in.sbet"),
                      angles_as_degrees=False)
    out = tmp_path / "out"
    assert pc.write_sbet(df.coalesce(1), str(out),
                         angles_as_degrees=False) == 1
    back = pc.read_sbet(spark, str(out), angles_as_degrees=False)
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b
