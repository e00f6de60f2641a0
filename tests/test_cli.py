"""pdal-style CLI (pdal_spark/cli.py): each subcommand mirrors a
reference kernel (kernels/*.cpp). Driven in-process; get_spark's
getOrCreate reuses the test session."""

import json

import pytest

from pdal_spark import cli


def run(capsys, argv):
    cli.main(["--master", "local[4]"] + argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


@pytest.fixture(scope="module")
def data(spark, tmp_path_factory):
    from pdal_spark.sources.faux import faux_reader

    d = tmp_path_factory.mktemp("cli")
    p = str(d / "pts.parquet")
    faux_reader(spark, 500, "uniform", ([0, 0], [50, 50])
                ).write.parquet(p)
    return d, p


def test_cli_info(spark, capsys, data):
    _d, p = data
    out = run(capsys, ["info", p, "--dims", "x,y"])
    assert out["rows"] == 500
    assert len(out["stats"]) == 2
    assert out["stats"][0]["cnt"] == 500


def test_cli_translate_and_sort(spark, capsys, data):
    d, p = data
    out_p = str(d / "tr.parquet")
    stage = json.dumps(
        [{"type": "filters.range", "limits": "x[10:40]"}]
    )
    out = run(capsys, ["translate", p, out_p, "--json", stage])
    assert 0 < out["rows"] < 500
    sort_p = str(d / "sorted.parquet")
    out2 = run(capsys, ["sort", out_p, sort_p, "--dims", "x"])
    assert out2["rows"] == out["rows"]
    pdf = spark.read.parquet(sort_p).toPandas()
    assert (pdf["x"].values[:-1] <= pdf["x"].values[1:]).all() or \
        len(pdf) == pdf["x"].nunique()  # written order per partition


def test_cli_tile_density_split(spark, capsys, data):
    d, p = data
    out = run(capsys, [
        "tile", p, str(d / "tiles"), "--length", "25",
        "--x", "x", "--y", "y",
        "--origin-x", "0", "--origin-y", "0",
    ])
    assert out["new_tiles"] >= 4
    out = run(capsys, ["density", p, "--res", "2",
                       "--x", "x", "--y", "y"])
    assert out["cells"] > 0
    out = run(capsys, ["split", p, str(d / "sp"),
                       "--capacity", "100"])
    assert out["rows"] == 500
    assert spark.read.parquet(str(d / "sp")).count() == 500


def test_cli_merge_random_delta(spark, capsys, data):
    d, p = data
    r2 = str(d / "r2.parquet")
    run(capsys, ["random", r2, "--count", "200",
                 "--minx", "0", "--miny", "0",
                 "--maxx", "50", "--maxy", "50"])
    m = str(d / "merged.parquet")
    out = run(capsys, ["merge", m, p, r2])
    assert out["rows"] == 700
    out = run(capsys, ["delta", p, r2,
                       "--x", "x", "--y", "y", "--id", "pid",
                       "--cell", "25"])
    assert out["chamfer"] >= 0.0 and out["hausdorff"] >= 0.0
    # chamfer/hausdorff kernel aliases run the same summary
    out2 = run(capsys, ["chamfer", p, r2,
                        "--x", "x", "--y", "y", "--id", "pid",
                        "--cell", "25"])
    assert out2["kernel"] == "chamfer"
    assert out2["chamfer"] == out["chamfer"]
    assert out2["hausdorff"] == out["hausdorff"]


def test_cli_eval(spark, capsys, tmp_path):
    p = str(tmp_path / "labeled.parquet")
    spark.createDataFrame(
        [(i, i % 2, (i % 4) % 2) for i in range(100)],
        "pid long, truth int, cls int",
    ).write.parquet(p)
    out = run(capsys, ["eval", p])
    # (i%4)%2 == i%2 always -> perfect score
    assert out["overall_accuracy"] == 1.0
    assert all(l["f1"] == 1.0 for l in out["labels"])


def test_cli_ground(spark, capsys, tmp_path):
    from pdal_spark.sources.faux import faux_reader

    p = str(tmp_path / "g.parquet")
    faux_reader(spark, 400, "uniform", ([0, 0, 0], [20, 20, 2])
                ).write.parquet(p)
    for method in ["smrf", "pmf", "csf"]:
        out = run(capsys, [
            "ground", p, str(tmp_path / f"out_{method}"),
            "--method", method, "--cell", "2",
        ])
        assert out["rows"] == 400
        assert 0 <= out["ground"] <= 400


def test_cli_curate(spark, capsys, tmp_path):
    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (1, "one clean document with plenty of useful words"),
            (2, "one clean document with plenty of useful words"),
            (3, "tiny"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)
    out = run(
        capsys,
        ["curate", src, str(tmp_path / "cur"), "--min-words", "3",
         "--jaccard", "0.5", "--shards", "2"],
    )
    assert out["kernel"] == "curate"
    assert out["quality"]["rows_out"] == 2
    assert out["exact_dedup"]["rows_out"] == 1


def test_cli_ingest(spark, capsys, tmp_path):
    from pdal_spark.sources.warc import write_warc_file

    seg = tmp_path / "segs"
    seg.mkdir()
    write_warc_file(
        str(seg / "a.warc"),
        [(f"https://x.com/{i}", "2026-01-01T00:00:00Z", "response",
          f"<html><p>hello world {i}</p></html>".encode())
         for i in range(5)],
    )
    out = run(capsys, ["ingest", str(seg), str(tmp_path / "pages"),
                       "--shards", "2"])
    assert out == {"kernel": "ingest", "pages": 5}
    pages = spark.read.parquet(str(tmp_path / "pages"))
    assert set(pages.columns) == {"url", "warc_ts", "html", "text"}
    assert pages.where("text = 'hello world 3'").count() == 1
