"""Wire-format and semantics pins for the pure-stdlib protobuf shim
(etl_python_sqlite_spark/_protobuf_shim).

The shim's correctness bar is interop with the JVM's REAL protobuf
inside the transformWithStateInPandas state server — exercised
end-to-end in test_skew_stateful. These tests pin the encoding against
hand-computed wire-format vectors (the public "Protocol Buffers
Encoding" spec) so a regression is caught without a JVM, and pin the
proto3 semantics the pyspark state clients rely on.
"""

from __future__ import annotations

import pytest

from etl_python_sqlite_spark.protoshim import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_varint_golden_vectors():
    from google.protobuf.message import decode_varint, encode_varint

    # spec examples: 1 -> 01, 150 -> 9601, 2^64-1 -> ff..01
    assert encode_varint(1) == b"\x01"
    assert encode_varint(150) == b"\x96\x01"
    assert encode_varint(-1) == b"\xff" * 9 + b"\x01"
    for v in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**31):
        enc = encode_varint(v)
        dec, pos = decode_varint(enc, 0)
        assert pos == len(enc)
        assert dec == (v if v >= 0 else v + (1 << 64))


def test_message_golden_bytes():
    # StateRequest{version=2, statefulProcessorCall{setHandleState{state=2}}}
    call = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
    )
    req = sm.StateRequest(version=2, statefulProcessorCall=call)
    assert req.SerializeToString() == bytes.fromhex("080212040a020802")

    # string field: StateCallCommand{stateName="ab"} -> 0a 02 'a' 'b'
    assert sm.StateCallCommand(stateName="ab").SerializeToString() == b"\x0a\x02ab"

    # int64 field negative: TimerInfo{timestampMs=-1} -> tag 0x10 + 10-byte varint
    assert (
        sm.TimerInfo(timestampMs=-1).SerializeToString()
        == b"\x10" + b"\xff" * 9 + b"\x01"
    )

    # proto3 implicit presence: defaults serialize to NOTHING
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""

    # bool true -> 0x08 0x01 on field 1? (fetchWithArrow is field 2 -> 0x10)
    assert sm.ListStatePut(fetchWithArrow=True).SerializeToString() == b"\x10\x01"


def test_oneof_and_presence_semantics():
    svr = sm.StateVariableRequest(
        valueStateCall=sm.ValueStateCall(stateName="a")
    )
    assert svr.WhichOneof("method") == "valueStateCall"
    assert svr.HasField("valueStateCall") and not svr.HasField("listStateCall")
    # auto-vivified write-through switches the oneof
    svr.listStateCall.stateName = "b"
    assert svr.WhichOneof("method") == "listStateCall"
    assert not svr.HasField("valueStateCall")

    # reading a submessage does NOT create presence
    cmd = sm.StateCallCommand()
    _ = cmd.ttl.durationMs
    assert not cmd.HasField("ttl")
    cmd.ttl.durationMs = 7
    assert cmd.HasField("ttl") and cmd.ttl.durationMs == 7

    # an embedded empty message in a oneof still serializes (length 0)
    vsc = sm.ValueStateCall(stateName="s", clear=sm.Clear())
    data = vsc.SerializeToString()
    rt = sm.ValueStateCall()
    rt.ParseFromString(data)
    assert rt.WhichOneof("method") == "clear"


def test_repeated_fields_roundtrip():
    put = sm.ListStatePut(value=[b"\x00" * 3, b"", b"xyz"], fetchWithArrow=False)
    rt = sm.ListStatePut()
    rt.ParseFromString(put.SerializeToString())
    assert list(rt.value) == [b"\x00" * 3, b"", b"xyz"]
    assert rt.fetchWithArrow is False

    resp = sm.StateResponseWithMapIterator(statusCode=1, errorMessage="boom")
    kv = resp.kvPair.add()
    kv.key, kv.value = b"k", b"v"
    resp.kvPair.add(key=b"k2", value=b"v2")
    rt2 = sm.StateResponseWithMapIterator()
    rt2.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in rt2.kvPair] == [(b"k", b"v"), (b"k2", b"v2")]
    assert rt2.statusCode == 1 and rt2.errorMessage == "boom"


def test_unknown_fields_skipped():
    from google.protobuf.message import encode_varint

    # append an unknown varint field (#15) and an unknown LEN field (#14)
    base = sm.StateCallCommand(stateName="x").SerializeToString()
    extra = (
        encode_varint((15 << 3) | 0) + encode_varint(99)
        + encode_varint((14 << 3) | 2) + encode_varint(3) + b"abc"
    )
    rt = sm.StateCallCommand()
    rt.ParseFromString(base + extra)
    assert rt.stateName == "x"


def test_proto3_optional_bytes():
    t = sm.TimerInfo(timestampMs=5)
    assert not t.HasField("key")
    t.key = b""
    # explicitly-set empty optional bytes IS present and serializes
    assert t.HasField("key")
    rt = sm.TimerInfo()
    rt.ParseFromString(t.SerializeToString())
    assert rt.HasField("key") and rt.key == b""


def test_merge_and_copy():
    a = sm.StateCallCommand(stateName="n", schema="s")
    b = sm.StateCallCommand()
    b.CopyFrom(a)
    a.stateName = "mutated"
    assert b.stateName == "n"  # CopyFrom is a deep copy

    # constructor kwargs copy embedded messages (real-protobuf semantics)
    inner = sm.SetHandleState(state=sm.CREATED)
    outer = sm.StatefulProcessorCall(setHandleState=inner)
    inner.state = sm.CLOSED
    assert outer.setHandleState.state == sm.CREATED


def test_enum_wrapper_and_module_constants():
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("TIMER_PROCESSED") == 4
    with pytest.raises(KeyError):
        sm.HandleState.Name(99)


def test_descriptor_graph():
    d = sm.StateRequest.DESCRIPTOR
    assert d.full_name.endswith("state.StateRequest")
    f = d.fields_by_name["statefulProcessorCall"]
    assert f.message_type is sm.StatefulProcessorCall.DESCRIPTOR
    assert f.containing_oneof is d.oneofs_by_name["method"]
    assert d.fields_by_number[1].name == "version"


def test_repeated_assignment_rejected_and_unknown_attr():
    msg = sm.ListStatePut()
    with pytest.raises(AttributeError):
        msg.value = [b"x"]
    with pytest.raises(AttributeError):
        msg.nope = 1
    with pytest.raises(ValueError):
        sm.ListStatePut(nope=1)
