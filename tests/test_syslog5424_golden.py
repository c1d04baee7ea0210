"""Golden pairs for the syslog RFC5424 decoder, mirroring
/root/reference/decoder/syslog_rfc5424_test.go's valid table rows."""

from tests.test_decode_golden import _decode

ACTION = {"type": "decode", "field": "log", "decoder": "syslog_rfc5424"}
HEAD = "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com myproc 10 ID47 "
SD = '[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"] '


def test_5424_valid_full(spark):
    row = _decode(
        spark,
        HEAD
        + '[exampleSDID@32473 iut="3" eventSource="My \\"Application\\"" eventID="1011"] '
        + "An application event log",
        ACTION,
    )
    assert (row.priority, row.facility, row.severity) == ("165", "20", "5")
    assert row.proto_version == "1" and row.message_id == "ID47"
    sd = row.structured_data["exampleSDID@32473"]
    assert sd["iut"] == "3" and sd["eventID"] == "1011"
    assert row.message == "An application event log"


def test_5424_priority_string_format(spark):
    row = _decode(
        spark,
        HEAD + SD + "An application event log",
        {
            **ACTION,
            "params": {
                "syslog_facility_format": "string",
                "syslog_severity_format": "string",
            },
        },
    )
    assert row.facility == "LOCAL4"
    assert row.severity == "NOTICE"


def test_5424_nil_fields(spark):
    """'-' markers decode to absent (NULL) fields."""
    row = _decode(
        spark,
        "<165>1 - mymachine.example.com myproc 10 ID47 " + SD + "msg",
        ACTION,
    )
    assert row.timestamp is None and row.hostname == "mymachine.example.com"

    row = _decode(
        spark,
        "<165>1 2003-10-11T22:14:15.003Z - myproc 10 ID47 " + SD + "msg",
        ACTION,
    )
    assert row.hostname is None and row.app_name == "myproc"

    row = _decode(
        spark,
        "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com - 10 ID47 " + SD + "msg",
        ACTION,
    )
    assert row.app_name is None and row.process_id == "10"

    row = _decode(
        spark,
        "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com myproc - ID47 " + SD + "msg",
        ACTION,
    )
    assert row.process_id is None and row.message_id == "ID47"

    row = _decode(
        spark,
        "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com myproc 10 - " + SD + "msg",
        ACTION,
    )
    assert row.message_id is None


def test_5424_no_sd(spark):
    row = _decode(spark, HEAD + "- An application event log", ACTION)
    assert row.structured_data is None
    assert row.message == "An application event log"


def test_5424_no_msg(spark):
    row = _decode(spark, (HEAD + SD).rstrip(), ACTION)
    assert row.structured_data["exampleSDID@32473"]["eventID"] == "1011"
    assert row.message in (None, "")


def test_5424_only_required(spark):
    row = _decode(spark, "<165>1 - - - - - - An application event log", ACTION)
    assert (row.priority, row.facility, row.severity) == ("165", "20", "5")
    assert row.proto_version == "1"
    assert row.timestamp is None and row.hostname is None
    assert row.app_name is None and row.process_id is None
    assert row.message_id is None and row.structured_data is None
    assert row.message == "An application event log"


def test_5424_multi_sd(spark):
    row = _decode(
        spark,
        HEAD
        + '[example1@123 param1="1" param2="two"]'
        + '[example2@123 param1="" param2="twotwo"] '
        + "An application event log",
        ACTION,
    )
    sd = row.structured_data
    assert sd["example1@123"]["param1"] == "1"
    assert sd["example1@123"]["param2"] == "two"
    assert sd["example2@123"]["param1"] == ""
    assert sd["example2@123"]["param2"] == "twotwo"
    assert row.message == "An application event log"
