"""Golden pairs for parse_re2 and convert_date, mirroring
/root/reference/plugin/action/parse_re2/parse_re2_test.go and
/root/reference/plugin/action/convert_date/convert_date_test.go."""

from tests.test_actions import run_actions

PG_RE = (
    r"(?P<date>[\d]{4}-[\d]{2}-[\d]{2} [\d]{2}:[\d]{2}:[\d]{2} GMT) "
    r"\[(?P<pid>[\d]+)\] => \[(?P<pid_message_number>[\d-]+)\] "
    r"client=(?P<client>[^,]*),db=(?P<db>[^,]*),user=(?P<user>[^,]*) "
    r"(LOG|HINT):  (?P<message>.+)"
)

JIRA_RE = (
    r"(?P<origin_ip>[\d]{1,3}\.[\d]{1,3}\.[\d]{1,3}\.[\d]{1,3}) "
    r"(?P<request_id>\w+) (?P<username>(\w+|-)) "
    r"\[(?P<timestamp>[\d]{2}/[a-zA-Z]{1,3}/[\d]{4}:[\d]{2}:[\d]{2}:[\d]{2} [+-][\d]{4})\] "
    r'"(?P<method_and_endpoint>.+)" (?P<status_code>([\d]+|-)) '
    r"(?P<bytes_sent>([\d]+|-)) (?P<processing_time>([\d]+|-)) "
    r'"(?P<accessed_url>.+)" "(?P<client>.+)" "(?P<session_id>.+)"'
)


def test_parse_re2_postgres_with_prefix(spark):
    """parse_re2_test.go TestDecode: named groups land at the root as
    literal `prefix.`-prefixed keys; the unnamed (LOG|HINT) group is
    skipped; the source field is removed."""
    line = (
        "2021-06-22 16:24:27 GMT [7291] => [2-1] "
        'client=test_client,db=test_db,user=test_user LOG:  '
        'listening on IPv4 address "0.0.0.0", port 5432'
    )
    out = run_actions(
        spark,
        [(line,)],
        "log string",
        [{"type": "parse_re2", "field": "log", "prefix": "prefix.", "re2": PG_RE}],
    )
    r = out.collect()[0].asDict()
    assert r["prefix.date"] == "2021-06-22 16:24:27 GMT"
    assert r["prefix.pid"] == "7291"
    assert r["prefix.pid_message_number"] == "2-1"
    assert r["prefix.client"] == "test_client"
    assert r["prefix.db"] == "test_db"
    assert r["prefix.user"] == "test_user"
    assert r["prefix.message"] == 'listening on IPv4 address "0.0.0.0", port 5432'
    assert r["log"] is None  # Suicide() on match


def test_parse_re2_jira_access_logs(spark):
    """parse_re2_test.go TestDecodeAccessLogsJira."""
    lines = [
        '10.115.195.13 0x51320775x2 jira_robot [07/Nov/2022:00:00:00 +0300] '
        '"GET /rest/api/2/issue/FRAUD-3847?fields=resolution HTTP/1.1" 200 198 20 '
        '"https://jit.o3.ru/secure/RapidBoard.jspa?rapidView=2701&selectedIssue=EXPC-3767'
        '&quickFilter=16465&quickFilter=15365" '
        '"Apache-HttpClient/4.5.13 (Java/11.0.9)" "nj56zg"',
        '10.115.195.12 0x51320774x2 ezabelin [07/Nov/2022:00:00:00 +0300] '
        '"GET /rest/api/2/issue/RP-4977?fields=resolution HTTP/1.1" 201 158 15 '
        '"-" "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 '
        '(KHTML, like Gecko) Chrome/106.0.0.0 Safari/537.36" "1tmznt9"',
    ]
    out = run_actions(
        spark,
        [(l,) for l in lines],
        "message string",
        [{"type": "parse_re2", "field": "message", "re2": JIRA_RE}],
    )
    rows = {r.origin_ip: r for r in out.collect()}
    r1 = rows["10.115.195.13"]
    assert r1.request_id == "0x51320775x2"
    assert r1.username == "jira_robot"
    assert r1.timestamp == "07/Nov/2022:00:00:00 +0300"
    assert r1.method_and_endpoint == "GET /rest/api/2/issue/FRAUD-3847?fields=resolution HTTP/1.1"
    assert (r1.status_code, r1.bytes_sent, r1.processing_time) == ("200", "198", "20")
    assert r1.session_id == "nj56zg"
    r2 = rows["10.115.195.12"]
    assert r2.username == "ezabelin"
    assert r2.accessed_url == "-"
    assert (r2.status_code, r2.bytes_sent, r2.processing_time) == ("201", "158", "15")
    assert r2.session_id == "1tmznt9"


def test_convert_date_reference_cases(spark):
    """convert_date_test.go TestConvert: unixtime passthrough,
    fractional truncation, nginx_errorlog parse."""
    out = run_actions(
        spark,
        [("998578502",), ("998578999.1346",), ("2022/02/07 13:06:14",)],
        "time string",
        [
            {
                "type": "convert_date",
                "field": "time",
                "source_formats": [
                    "rfc3339nano", "rfc3339", "ansic", "unixtime", "nginx_errorlog",
                ],
                "target_format": "unixtime",
            }
        ],
    )
    got = [r.time for r in out.collect()]
    assert got == ["998578502", "998578999", "1644239174"]


def test_convert_date_remove_on_fail(spark):
    """convert_date_test.go TestConvertFail."""
    out = run_actions(
        spark,
        [("XXX",)],
        "time string",
        [
            {
                "type": "convert_date",
                "field": "time",
                "source_formats": ["rfc3339nano", "rfc3339", "ansic"],
                "remove_on_fail": True,
            }
        ],
    )
    assert out.collect()[0].time is None
