"""Golden pairs for the protobuf decoder, mirroring
/root/reference/decoder/protobuf_test.go byte for byte (the inputData
wire message against the MyMessage proto), via the pure-Python proto3
fallback (no spark-protobuf jar in this environment)."""

import pytest

from file_d_spark import protowire
from file_d_spark.engine import Pipeline

PROTO = """syntax = "proto3";

package test;
option go_package = "test.v1";

message Data {
  string stringData = 1 [json_name="string_data"];
  int32 intData = 2 [json_name="int_data"];
}

message MyMessage {
  message InternalData {
    repeated string myStrings = 1 [json_name="my_strings"];
    bool isValid = 2 [json_name="is_valid"];
  }

  Data data = 1;
  InternalData internalData = 2 [json_name="internal_data"];
  uint64 version = 3;
}
"""

INPUT = bytes(
    [10, 13, 10, 9, 109, 121, 95, 115, 116, 114, 105, 110, 103, 16, 123, 18,
     14, 10, 4, 115, 116, 114, 49, 10, 4, 115, 116, 114, 50, 16, 1, 24, 10]
)


def test_protowire_decode_pure():
    registry = protowire.parse_proto(PROTO)
    assert "MyMessage" in registry and "Data" in registry
    got = protowire.decode_message(INPUT, registry["MyMessage"], registry)
    assert got == {
        "data": {"string_data": "my_string", "int_data": 123},
        "internal_data": {"my_strings": ["str1", "str2"], "is_valid": True},
        "version": "10",  # protojson renders uint64 as string
    }


def test_protobuf_decoder_spark(spark):
    df = spark.createDataFrame([(INPUT,), (None,)], "log binary")
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "decode",
                    "field": "log",
                    "decoder": "protobuf",
                    "params": {"proto_file": PROTO, "proto_message": "MyMessage"},
                }
            ]
        }
    )
    rows = p.apply(df).collect()
    full = next(r for r in rows if r.data is not None)
    assert full.data.string_data == "my_string"
    assert full.data.int_data == 123
    assert list(full.internal_data.my_strings) == ["str1", "str2"]
    assert full.internal_data.is_valid is True
    assert full.version == "10"


def test_protobuf_decoder_invalid_configs(spark):
    df = spark.createDataFrame([(INPUT,)], "log binary")
    with pytest.raises(Exception):
        Pipeline.from_dict(
            {"actions": [{"type": "decode", "field": "log", "decoder": "protobuf",
                          "params": {"proto_message": "MyMessage"}}]}
        ).apply(df)
    with pytest.raises(Exception):
        Pipeline.from_dict(
            {"actions": [{"type": "decode", "field": "log", "decoder": "protobuf",
                          "params": {"proto_file": PROTO, "proto_message": "NotFound"}}]}
        ).apply(df)


def test_protowire_scalar_kinds():
    """zigzag, fixed, float, packed repeated, bytes/base64."""
    proto = """syntax = "proto3";
    message S {
      sint32 a = 1;
      fixed32 b = 2;
      double c = 3;
      repeated int32 d = 4;
      bytes e = 5;
    }
    """
    registry = protowire.parse_proto(proto)
    import struct

    wire = b""
    wire += bytes([1 << 3 | 0]) + bytes([1])          # a = zigzag(1) = -1
    wire += bytes([2 << 3 | 5]) + struct.pack("<I", 7)  # b = 7
    wire += bytes([3 << 3 | 1]) + struct.pack("<d", 1.5)  # c = 1.5
    wire += bytes([4 << 3 | 2, 3, 1, 2, 3])           # d packed [1,2,3]
    wire += bytes([5 << 3 | 2, 2]) + b"\x01\x02"      # e
    got = protowire.decode_message(wire, registry["S"], registry)
    assert got["a"] == -1
    assert got["b"] == 7
    assert got["c"] == 1.5
    assert got["d"] == [1, 2, 3]
    import base64

    assert got["e"] == base64.b64encode(b"\x01\x02").decode()
