"""Unit contracts for the vendored pure-Python protobuf runtime
(vendor/pure_protobuf) — wire bytes checked against HAND-ENCODED
sequences from the public encoding spec, independent of the shim's own
encoder. No Spark session needed."""

from __future__ import annotations

import pytest

from kickstarter_etl_pipeline_spark.streaming.tws_sessionize import (
    ensure_protobuf,
)

pytestmark = pytest.mark.skipif(
    not ensure_protobuf(), reason="no protobuf runtime (real or vendored)"
)


def _sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_parse_hand_encoded_response():
    """StateResponse{statusCode=2, errorMessage='no', value=b'\\x01\\x02'}
    — tags/lengths written by hand per the published wire format."""
    sm = _sm()
    hand = (
        bytes([0x08, 0x02])  # field 1 varint 2
        + bytes([0x12, 0x02]) + b"no"  # field 2 len=2
        + bytes([0x1A, 0x02, 0x01, 0x02])  # field 3 len=2
    )
    r = sm.StateResponse()
    r.ParseFromString(hand)
    assert (r.statusCode, r.errorMessage, r.value) == (2, "no", b"\x01\x02")
    # and the serializer reproduces the same bytes (number-ordered fields)
    assert (
        sm.StateResponse(statusCode=2, errorMessage="no", value=b"\x01\x02")
        .SerializeToString()
        == hand
    )


def test_proto3_default_elision_and_unknown_field_skip():
    sm = _sm()
    assert sm.StateResponse().SerializeToString() == b""
    assert sm.Exists().SerializeToString() == b""
    # unknown field 15 (varint) must be skipped, not crash
    r = sm.StateResponse()
    r.ParseFromString(bytes([0x08, 0x02, 0x78, 0x2A]))
    assert r.statusCode == 2


def test_nested_oneof_request_roundtrip():
    sm = _sm()
    req = sm.StateRequest(
        version=2,
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(stateName="s1", exists=sm.Exists())
        ),
    )
    data = req.SerializeToString()
    # exact expected bytes, hand-derived:
    # 08 02 | 1a 08 [ 0a 06 [ 0a 02 's1' 12 00 ] ]
    assert data == bytes.fromhex("08021a080a060a0273311200")
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.version == 2
    assert back.WhichOneof("method") == "stateVariableRequest"
    assert back.stateVariableRequest.valueStateCall.stateName == "s1"
    # assigning another oneof member clears the first
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        setImplicitKey=sm.SetImplicitKey(key=b"k")
    )
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"


def test_int64_negative_and_large_roundtrip():
    sm = _sm()
    for v in (-1, -(2**31), 2**62, 0, 1):
        t = sm.RegisterTimer(expiryTimestampMs=v)
        back = sm.RegisterTimer()
        back.ParseFromString(t.SerializeToString())
        assert back.expiryTimestampMs == v
    # negative int64 is the 10-byte two's-complement varint per spec
    assert sm.RegisterTimer(expiryTimestampMs=-1).SerializeToString() == (
        bytes([0x08]) + b"\xff" * 9 + b"\x01"
    )


def test_repeated_fields_and_enum():
    sm = _sm()
    p = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=True)
    q = sm.ListStatePut()
    q.ParseFromString(p.SerializeToString())
    assert list(q.value) == [b"a", b"bb"] and q.fetchWithArrow is True
    kv = [sm.KeyAndValuePair(key=b"k1", value=b"v1"),
          sm.KeyAndValuePair(key=b"k2", value=b"v2")]
    m = sm.StateResponseWithMapIterator(statusCode=0, kvPair=kv,
                                        requireNextFetch=True)
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(m.SerializeToString())
    assert [(x.key, x.value) for x in back.kvPair] == [(b"k1", b"v1"),
                                                       (b"k2", b"v2")]
    assert back.requireNextFetch is True
    # top-level enum constants exist with proto-declared numbers
    assert (sm.PRE_INIT, sm.CREATED, sm.INITIALIZED, sm.DATA_PROCESSED,
            sm.TIMER_PROCESSED, sm.CLOSED) == (0, 1, 2, 3, 4, 5)
    sh = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    back2 = sm.StateRequest()
    back2.ParseFromString(sh.SerializeToString())
    assert back2.statefulProcessorCall.setHandleState.state == sm.CLOSED


# --- property tests: roundtrip + independent encoder cross-check ------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    def _ref_encode_response(status: int, err: str, value: bytes) -> bytes:
        """Independent reference encoder for StateResponse, written from
        the wire spec with a DIFFERENT construction than the shim's
        (recursive bytes concat, no shared helpers) — agreement between
        the two implementations pins the format, not the code."""

        def vint(v: int) -> bytes:
            if v < 0:
                v += 1 << 64
            out = b""
            while v > 0x7F:
                out += bytes([(v & 0x7F) | 0x80])
                v >>= 7
            return out + bytes([v])

        parts = b""
        if status != 0:
            parts += b"\x08" + vint(status)
        eb = err.encode()
        if eb:
            parts += b"\x12" + vint(len(eb)) + eb
        if value:
            parts += b"\x1a" + vint(len(value)) + value
        return parts

    @settings(max_examples=200, deadline=None)
    @given(
        status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
        err=st.text(max_size=60),
        value=st.binary(max_size=80),
    )
    def test_response_encoding_matches_independent_reference(status, err, value):
        sm = _sm()
        mine = sm.StateResponse(
            statusCode=status, errorMessage=err, value=value
        ).SerializeToString()
        assert mine == _ref_encode_response(status, err, value)
        back = sm.StateResponse()
        back.ParseFromString(mine)
        assert (back.statusCode, back.errorMessage, back.value) == (
            status, err, value,
        )

    @settings(max_examples=200, deadline=None)
    @given(
        ts=st.integers(min_value=-(2**63), max_value=2**63 - 1),
        values=st.lists(st.binary(max_size=40), max_size=8),
        arrow=st.booleans(),
        name=st.text(max_size=40),
    )
    def test_request_shapes_roundtrip(ts, values, arrow, name):
        sm = _sm()
        t = sm.RegisterTimer(expiryTimestampMs=ts)
        t2 = sm.RegisterTimer()
        t2.ParseFromString(t.SerializeToString())
        assert t2.expiryTimestampMs == ts

        p = sm.ListStatePut(value=values, fetchWithArrow=arrow)
        p2 = sm.ListStatePut()
        p2.ParseFromString(p.SerializeToString())
        assert list(p2.value) == values and p2.fetchWithArrow is arrow

        c = sm.StateCallCommand(
            stateName=name, schema=name, ttl=sm.TTLConfig(durationMs=abs(ts) % (2**62))
        )
        c2 = sm.StateCallCommand()
        c2.ParseFromString(c.SerializeToString())
        assert c2.stateName == name and c2.ttl.durationMs == abs(ts) % (2**62)


def test_nested_submessage_auto_vivifies_on_write():
    """r13 ADVICE: writing into a read-created default view of an unset
    singular message field must persist into the parent (real-protobuf
    auto-vivification), not be silently discarded — while a read-only
    access must NOT set presence."""
    sm = _sm()
    cmd = sm.StateCallCommand()
    cmd.ttl.durationMs = 1234
    assert cmd.HasField("ttl") and cmd.ttl.durationMs == 1234
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.ttl.durationMs == 1234

    # recursive: a two-deep chain attaches every hop, and the oneof
    # registers the vivified member
    req = sm.StateRequest()
    req.stateVariableRequest.valueStateCall.stateName = "deep"
    assert req.WhichOneof("method") == "stateVariableRequest"
    rt = sm.StateRequest()
    rt.ParseFromString(req.SerializeToString())
    assert rt.stateVariableRequest.valueStateCall.stateName == "deep"

    # read-only access never sets presence
    probe = sm.StateCallCommand()
    assert probe.ttl.durationMs == 0
    assert not probe.HasField("ttl")


def test_stale_view_does_not_clobber_later_value():
    """A detached view handed out BEFORE the field was parsed must not
    overwrite the parsed value when mutated afterwards."""
    sm = _sm()
    cmd = sm.StateCallCommand()
    stale = cmd.ttl  # detached default view
    parsed = sm.StateCallCommand(ttl=sm.TTLConfig(durationMs=77))
    cmd.ParseFromString(parsed.SerializeToString())
    stale.durationMs = 99  # must NOT displace the parsed 77
    assert cmd.ttl.durationMs == 77


def test_truncated_length_delimited_field_raises():
    """r13 ADVICE: a truncated unknown length-delimited field must raise
    instead of silently ending the parse as if the message were
    complete (field 15 here is unknown to StateResponse; its declared
    5-byte payload has only 2 bytes on the wire)."""
    sm = _sm()
    r = sm.StateResponse()
    with pytest.raises(Exception):
        r.ParseFromString(bytes([0x08, 0x02, 0x7A, 0x05, 0x01, 0x02]))
