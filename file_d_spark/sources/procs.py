"""Host-process sources: journalctl and dmesg.

The reference spawns ``journalctl`` and parses its JSON output
(/root/reference/plugin/input/journalctl/journalctl.go:34) and reads
``/dev/kmsg`` (/root/reference/plugin/input/dmesg/dmesg.go:34).  These
are single-host readers with no distributed analogue: the Spark
mapping is a driver-side subprocess pump into a spool directory (same
pattern as the http/socket ingest front-ends), read by the file
source.  The subprocess command is injectable so environments without
systemd (like this container) can test the plumbing.
"""

from __future__ import annotations

import subprocess
import threading

from file_d_spark.sources.ingest import _SpoolWriter


class ProcessPump:
    """Spawn a line-emitting process; append its stdout to a spool."""

    def __init__(self, cmd: list[str], spool_dir: str, batch_lines: int = 1000):
        self.cmd = cmd
        self.writer = _SpoolWriter(spool_dir)
        self.batch_lines = batch_lines
        self._proc: subprocess.Popen | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "ProcessPump":
        self._proc = subprocess.Popen(
            self.cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL
        )

        def pump():
            buf: list[bytes] = []
            assert self._proc and self._proc.stdout
            for line in self._proc.stdout:
                buf.append(line)
                if len(buf) >= self.batch_lines:
                    self.writer.write_lines(b"".join(buf))
                    buf = []
            if buf:
                self.writer.write_lines(b"".join(buf))

        self._thread = threading.Thread(target=pump, daemon=True)
        self._thread.start()
        return self

    def wait(self, timeout: float | None = None):
        if self._proc:
            self._proc.wait(timeout)
        if self._thread:
            self._thread.join(timeout)

    def stop(self):
        if self._proc and self._proc.poll() is None:
            self._proc.terminate()


def journalctl_pump(spool_dir: str, extra_args: list[str] | None = None,
                    cmd: list[str] | None = None) -> ProcessPump:
    """``journalctl -f -o json`` -> spool.  Pass ``cmd`` to substitute
    the binary (testing / non-systemd hosts)."""
    return ProcessPump(cmd or ["journalctl", "-f", "-o", "json", *(extra_args or [])], spool_dir)


def dmesg_pump(spool_dir: str, cmd: list[str] | None = None) -> ProcessPump:
    """``dmesg --follow --json`` (or /dev/kmsg via cat) -> spool."""
    return ProcessPump(cmd or ["dmesg", "--follow", "--json"], spool_dir)
