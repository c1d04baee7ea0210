"""journalctl/dmesg process pumps (injected command) and the socket
sink (live local TCP server)."""

import json
import socketserver
import threading


def test_journalctl_pump_to_pipeline(spark, tmp_path):
    from file_d_spark import Pipeline
    from file_d_spark.sources.procs import journalctl_pump

    spool = str(tmp_path / "spool")
    lines = [json.dumps({"MESSAGE": f"boot {i}", "PRIORITY": str(i % 8)}) for i in range(6)]
    pump = journalctl_pump(
        spool, cmd=["printf", "%s\n" * len(lines), *lines]
    ).start()
    pump.wait(10)

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "MESSAGE string, PRIORITY string"},
            },
            "input": {"type": "journalctl", "spool_dir": spool},
            "actions": [
                {"type": "convert_log_level", "field": "PRIORITY", "style": "string"}
            ],
        }
    )
    rows = p.run_batch(spark).orderBy("MESSAGE").collect()
    assert len(rows) == 6
    assert rows[0].MESSAGE == "boot 0"
    assert rows[3].PRIORITY == "error"  # 3 -> error


def test_journalctl_args_assembly(tmp_path):
    """reader.go:67-80: -o json -a forced, -c cursor resumes else
    -n all, then journal_args (default -f); max_lines caps the pump."""
    from file_d_spark.sources.procs import journalctl_args, journalctl_pump

    assert journalctl_args() == ["-o", "json", "-a", "-n", "all", "-f"]
    assert journalctl_args(cursor="s=abc") == [
        "-o", "json", "-a", "-c", "s=abc", "-f",
    ]
    assert journalctl_args(["-u", "nginx"], max_lines=5) == [
        "-o", "json", "-a", "-n", "all", "-u", "nginx",
    ]

    spool = str(tmp_path / "spool_max")
    lines = [f"line-{i}" for i in range(10)]
    pump = journalctl_pump(
        spool, cmd=["printf", "%s\n" * len(lines), *lines], max_lines=4
    ).start()
    pump.wait(10)
    import glob as _g

    got = []
    for f in _g.glob(f"{spool}/*"):
        got.extend(open(f).read().splitlines())
    assert len(got) == 4


def test_socket_sink_tcp(spark, tmp_path):
    from file_d_spark import Pipeline

    received = []
    done = threading.Event()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                received.append(json.loads(line))
            done.set()

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n long").coalesce(1)
        Pipeline.from_dict(
            {"output": {"type": "socket", "host": "127.0.0.1", "port": port}}
        ).write(df)
        done.wait(20)
    finally:
        srv.shutdown()
    assert sorted(r["k"] for r in received) == ["a", "b"]


def test_dmesg_pump_to_pipeline(spark, tmp_path):
    from file_d_spark import Pipeline
    from file_d_spark.sources.procs import dmesg_pump

    spool = str(tmp_path / "dspool")
    lines = [
        json.dumps({"msg": f"usb {i}: device connected", "pri": "6"})
        for i in range(4)
    ]
    pump = dmesg_pump(spool, cmd=["printf", "%s\n" * len(lines), *lines]).start()
    pump.wait(10)

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "msg string, pri string"},
            },
            "input": {"type": "dmesg", "spool_dir": spool},
        }
    )
    rows = p.run_batch(spark).orderBy("msg").collect()
    assert len(rows) == 4
    assert rows[0].msg == "usb 0: device connected"
