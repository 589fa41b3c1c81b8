"""Wire-format contract tests for the vendored protobuf shim.

The shim's real proof is the end-to-end transformWithStateInPandas
test (the JVM state server parses every request the shim serializes
and vice versa); these unit tests pin the wire-format corners that
e2e traffic may not touch every run — negative varints, packed vs
unpacked repeated parsing, presence semantics, unknown-field skip.
No Spark session needed.
"""

from __future__ import annotations

from cost_of_living_data_etl_spark.vendor import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

from cost_of_living_data_etl_spark.vendor.google.protobuf import (  # noqa: E402
    minipb,
)


def test_nested_oneof_request_roundtrip():
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.schema = '{"t":1}'
    cmd.ttl.durationMs = 12345
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    got = back.statefulProcessorCall.getValueState
    assert (got.stateName, got.schema, got.ttl.durationMs) == (
        "s", '{"t":1}', 12345
    )


def test_negative_int64_is_two_complement_varint():
    # protobuf spec: negative varints are 10-byte 64-bit 2's complement
    msg = sm.RegisterTimer(expiryTimestampMs=-1)
    data = msg.SerializeToString()
    assert data == b"\x08" + b"\xff" * 9 + b"\x01"
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_empty_submessage_presence_survives_wire():
    # oneof members that are EMPTY messages must still be transmitted
    # (presence selects the method) — a zero-length field 2 payload
    call = sm.ValueStateCall(stateName="x", exists=sm.Exists())
    data = call.SerializeToString()
    back = sm.ValueStateCall()
    back.ParseFromString(data)
    fields = object.__getattribute__(back, "_fields")
    assert "exists" in fields  # presence, not just default
    assert back.stateName == "x"


def test_unset_submessage_is_absent_until_written():
    # reading a submessage field must NOT create presence (protobuf's
    # lazy-vivification contract); writing through it must
    cmd = sm.StateCallCommand(stateName="a")
    _ = cmd.ttl.durationMs  # read-only touch
    assert b"\x22" not in cmd.SerializeToString()  # no ttl tag (4|wt2)
    cmd.ttl.durationMs = 9
    assert b"\x22" in cmd.SerializeToString()


def test_repeated_bytes_roundtrip_and_packed_varint_parse():
    put = sm.ListStatePut(value=[b"a", b"bb", b""], fetchWithArrow=True)
    back = sm.ListStatePut()
    back.ParseFromString(put.SerializeToString())
    assert back.value == [b"a", b"bb", b""]
    assert back.fetchWithArrow is True

    # hand-built PACKED repeated varint must parse too (JVM may pack):
    # field 3 of StateResponseWithListGet is repeated bytes — use a
    # synthetic message over minipb directly for the packed case
    fd = minipb.FieldDef()
    fd.name, fd.number, fd.type, fd.label = "xs", 1, minipb.T_INT64, 3
    md = minipb.MsgDef("P", ".P")
    md.fields = [fd]
    md.index()
    cls = type("P", (minipb.Message,), {"__slots__": (), "_msgdef": md})
    packed = b"\x0a\x03\x01\x02\x7f"  # field1 wt2 len3: [1,2,127]
    m = cls()
    m.ParseFromString(packed)
    assert m.xs == [1, 2, 127]
    unpacked = b"\x08\x01\x08\x02\x08\x7f"  # same values, wt0 each
    m2 = cls()
    m2.ParseFromString(unpacked)
    assert m2.xs == [1, 2, 127]


def test_unknown_fields_are_skipped_not_fatal():
    # field 15 (unknown to StateResponse) with wiretypes 0 and 2
    data = b"\x78\x2a" + b"\x7a\x03abc" + b"\x08\x02"
    resp = sm.StateResponse()
    resp.ParseFromString(data)
    assert resp.statusCode == 2


def test_enum_constants_match_proto_declaration():
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED) == (0, 1, 2)
    assert (sm.DATA_PROCESSED, sm.TIMER_PROCESSED, sm.CLOSED) == (3, 4, 5)


def test_handle_state_request_bytes_golden():
    # golden bytes: StateRequest{statefulProcessorCall{setHandleState{
    # state: CLOSED}}} — field tags 2/1/1, enum varint 5
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    assert req.SerializeToString() == b"\x12\x04\x0a\x02\x08\x05"


# --------------------------------------------------------------------------
# property-based hardening (hypothesis): the shim is the transport for
# ALL transformWithStateInPandas traffic, so fuzz the round trip
# --------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)


@settings(max_examples=200, deadline=None)
@given(v=_i64)
def test_prop_int64_roundtrip(v):
    m = sm.RegisterTimer(expiryTimestampMs=v)
    back = sm.RegisterTimer()
    back.ParseFromString(m.SerializeToString())
    assert back.expiryTimestampMs == v


@settings(max_examples=200, deadline=None)
@given(v=_i32)
def test_prop_int32_roundtrip(v):
    m = sm.StateResponse(statusCode=v)
    back = sm.StateResponse()
    back.ParseFromString(m.SerializeToString())
    assert back.statusCode == v


@settings(max_examples=200, deadline=None)
@given(s=st.text(max_size=200), b=st.binary(max_size=200))
def test_prop_string_bytes_roundtrip(s, b):
    m = sm.StateResponse(statusCode=1, errorMessage=s, value=b)
    back = sm.StateResponse()
    back.ParseFromString(m.SerializeToString())
    assert (back.statusCode, back.errorMessage, back.value) == (1, s, b)


@settings(max_examples=100, deadline=None)
@given(vals=st.lists(st.binary(max_size=64), max_size=30), f=st.booleans())
def test_prop_repeated_bytes_roundtrip(vals, f):
    m = sm.ListStatePut(value=vals, fetchWithArrow=f)
    back = sm.ListStatePut()
    back.ParseFromString(m.SerializeToString())
    assert back.value == vals
    assert back.fetchWithArrow is f


@settings(max_examples=100, deadline=None)
@given(
    name=st.text(max_size=50),
    schema=st.text(max_size=100),
    ttl=st.one_of(st.none(), st.integers(min_value=0, max_value=2**62)),
)
def test_prop_nested_request_roundtrip_and_stability(name, schema, ttl):
    cmd = sm.StateCallCommand()
    cmd.stateName = name
    cmd.schema = schema
    if ttl is not None:
        cmd.ttl.durationMs = ttl
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    got = back.statefulProcessorCall.getValueState
    assert (got.stateName, got.schema) == (name, schema)
    if ttl is not None:
        assert got.ttl.durationMs == ttl
    # serialize(parse(x)) is byte-stable (fields emit in number order)
    assert back.SerializeToString() == data


def _synthetic_cls(ftype, label=3, name="xs"):
    fd = minipb.FieldDef()
    fd.name, fd.number, fd.type, fd.label = name, 1, ftype, label
    md = minipb.MsgDef("S", ".S")
    md.fields = [fd]
    md.index()
    return type("S", (minipb.Message,), {"__slots__": (), "_msgdef": md})


def test_repeated_scalar_packed_roundtrip_all_wire_widths():
    """ADVICE r05: repeated sint/fixed/float/double must SERIALIZE (packed)
    and parse back — no parse/serialize asymmetry."""
    cases = [
        (minipb.T_SINT64, [-3, 0, 7, -(1 << 40)]),
        (minipb.T_SFIXED64, [-9, 0, 1 << 40]),
        (minipb.T_SFIXED32, [-9, 0, 1 << 20]),
        (minipb.T_DOUBLE, [0.5, -2.25, 1e300]),
        (minipb.T_FLOAT, [0.5, -2.25, 1024.0]),
    ]
    for ftype, vals in cases:
        cls = _synthetic_cls(ftype)
        m = cls(xs=list(vals))
        back = cls()
        back.ParseFromString(m.SerializeToString())
        assert back.xs == vals, ftype


def test_unsigned_fixed_values_roundtrip_parse_then_serialize():
    """Round-6 review: the T_FIXED64/T_FIXED32 decoder is unsigned
    ('<Q'/'<I'), so parse→serialize of a valid uint64 ≥ 2^63 (or
    uint32 ≥ 2^31) must not crash in struct.pack — the encoder masks
    and packs unsigned. Negative sfixed values keep round-tripping
    through the same masked path (two's complement)."""
    cases = [
        (minipb.T_FIXED64, [(1 << 63), (1 << 64) - 1, 0, 7]),
        (minipb.T_FIXED32, [0x80000000, 0xFFFFFFFF, 0, 7]),
        (minipb.T_SFIXED64, [-(1 << 62), -1, 5]),
        (minipb.T_SFIXED32, [-(1 << 30), -1, 5]),
    ]
    for ftype, vals in cases:
        # packed repeated
        cls = _synthetic_cls(ftype)
        back = cls()
        back.ParseFromString(cls(xs=list(vals)).SerializeToString())
        assert back.xs == vals, ftype
        # double round-trip (parse → serialize → parse) is stable
        again = cls()
        again.ParseFromString(back.SerializeToString())
        assert again.xs == vals, ftype
        # scalar
        cls1 = _synthetic_cls(ftype, label=1)
        b1 = cls1()
        b1.ParseFromString(cls1(xs=vals[0]).SerializeToString())
        assert b1.xs == vals[0], ftype


def test_truncated_fixed_width_fields_raise_clear_decode_error():
    """ADVICE r05: a truncated fixed64/fixed32 must surface as a clear
    ValueError from _walk, not an opaque struct.unpack error later."""
    import pytest

    cls64 = _synthetic_cls(minipb.T_DOUBLE, label=1)
    with pytest.raises(ValueError, match="truncated fixed64"):
        cls64().ParseFromString(b"\x09\x01\x02\x03")  # wt1, only 3 bytes
    cls32 = _synthetic_cls(minipb.T_FLOAT, label=1)
    with pytest.raises(ValueError, match="truncated fixed32"):
        cls32().ParseFromString(b"\x0d\x01\x02")  # wt5, only 2 bytes
    # packed blob whose length is not a multiple of the element width
    clsp = _synthetic_cls(minipb.T_SFIXED32)
    with pytest.raises(ValueError, match="packed fixed32"):
        clsp().ParseFromString(b"\x0a\x05\x01\x02\x03\x04\x05")
