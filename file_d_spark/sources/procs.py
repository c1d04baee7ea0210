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

    def __init__(self, cmd: list[str], spool_dir: str, batch_lines: int = 1000,
                 max_lines: int = 0):
        self.cmd = cmd
        self.writer = _SpoolWriter(spool_dir)
        self.batch_lines = batch_lines
        # journalctl.go:52 MaxLines: stop after N lines (0 = unbounded)
        self.max_lines = max_lines
        self._proc: subprocess.Popen | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "ProcessPump":
        self._proc = subprocess.Popen(
            self.cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL
        )

        def pump():
            buf: list[bytes] = []
            total = 0
            assert self._proc and self._proc.stdout
            for line in self._proc.stdout:
                buf.append(line)
                total += 1
                if len(buf) >= self.batch_lines:
                    self.writer.write_lines(b"".join(buf))
                    buf = []
                if self.max_lines and total >= self.max_lines:
                    self._proc.terminate()
                    break
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


def journalctl_args(
    journal_args: list[str] | None = None,
    cursor: str = "",
    max_lines: int = 0,
) -> list[str]:
    """Reference argument assembly (reader.go:67-80 + journalctl.go:
    46-52): ``-o json -a`` always forced, then ``-c <cursor>`` to
    resume a stored position or ``-n all`` for a fresh start, then the
    user's ``journal_args`` (default ``-f``).  ``max_lines`` bounds
    the emitted lines (the reference counts lines in the read loop;
    here the same cap is applied by ProcessPump)."""
    args = ["-o", "json", "-a"]
    if cursor:
        args += ["-c", cursor]
    else:
        args += ["-n", "all"]
    args += list(journal_args) if journal_args is not None else ["-f"]
    _ = max_lines  # consumed by the pump, kept here for signature parity
    return args


def journalctl_pump(spool_dir: str, extra_args: list[str] | None = None,
                    cmd: list[str] | None = None, cursor: str = "",
                    max_lines: int = 0) -> ProcessPump:
    """``journalctl`` -> spool with the reference's argument assembly.
    Pass ``cmd`` to substitute the binary (testing / non-systemd
    hosts); ``extra_args`` maps the config's ``journal_args``."""
    return ProcessPump(
        cmd or ["journalctl", *journalctl_args(extra_args, cursor)],
        spool_dir,
        max_lines=max_lines,
    )


def dmesg_pump(spool_dir: str, cmd: list[str] | None = None) -> ProcessPump:
    """``dmesg --follow --json`` (or /dev/kmsg via cat) -> spool."""
    return ProcessPump(cmd or ["dmesg", "--follow", "--json"], spool_dir)
