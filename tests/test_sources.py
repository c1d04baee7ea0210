"""Source builder tests: k8s filename enrichment, meta templates,
CRI auto-decoder suggestion."""

import json


def test_k8s_input_enrichment(spark, tmp_path):
    from file_d_spark import Pipeline

    logdir = tmp_path / "logs"
    logdir.mkdir()
    cid = "a" * 64
    fname = f"mypod-5c9b_prod_nginx-{cid}.log"
    with open(logdir / fname, "w") as fh:
        fh.write("2024-01-01T00:00:00.000000000Z stdout F hello world\n")
        fh.write("2024-01-01T00:00:01.000000000Z stderr F oops\n")

    registry = tmp_path / "registry.jsonl"
    with open(registry, "w") as fh:
        fh.write(
            json.dumps(
                {
                    "k8s_pod": "mypod-5c9b",
                    "k8s_namespace": "prod",
                    "k8s_node": "node-7",
                }
            )
            + "\n"
        )

    p = Pipeline.from_dict(
        {
            "settings": {"decoder": "auto"},
            "input": {
                "type": "k8s",
                "path": str(logdir),
                "pod_registry": str(registry),
            },
        }
    )
    rows = p.run_batch(spark).orderBy("time").collect()
    assert len(rows) == 2
    r = rows[0]
    # auto decoder resolved to CRI (k8s input suggestion)
    assert r.log == "hello world"
    assert r.stream == "stdout"
    assert r.k8s_pod == "mypod-5c9b"
    assert r.k8s_namespace == "prod"
    assert r.k8s_container == "nginx"
    assert r.k8s_container_id == cid
    assert r.k8s_node == "node-7"


def test_meta_templates(spark, tmp_path):
    from file_d_spark import Pipeline

    indir = tmp_path / "in"
    indir.mkdir()
    with open(indir / "x.log", "w") as fh:
        fh.write('{"key":"v1"}\n')

    p = Pipeline.from_dict(
        {
            "settings": {"decoder": "json", "decoder_params": {"schema": "key string"}},
            "input": {
                "type": "file",
                "path": str(indir),
                "filename_pattern": "*.log",
                "meta": {"origin": "file:{{ .source_name }}"},
            },
        }
    )
    row = p.run_batch(spark).collect()[0]
    assert row.origin.startswith("file:")
    assert row.origin.endswith("x.log")


def test_register_views_sql_surface(spark, sf_dir):
    """register_views exposes every testdata table as a temp view so
    users can drive the engine from spark.sql directly."""
    from file_d_spark.tables import register_views

    register_views(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM events").collect()[0].n
    assert n > 0
    joined = spark.sql(
        "SELECT count(*) AS n FROM nation "
        "JOIN region ON n_regionkey = r_regionkey"
    ).collect()[0].n
    assert joined == 25
