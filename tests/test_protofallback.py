"""Unit tests for the vendored pure-Python protobuf runtime subset
(vendor/protofallback) against pyspark's generated StateMessage_pb2.

No SparkSession needed: these exercise the wire codec and message
semantics directly. The end-to-end JVM interop check is
test_streaming_state.py (the TWS state server parses these bytes).
"""

from __future__ import annotations

import sys

import pytest

from det_module_spark.streaming.state import ensure_protobuf

MODE = ensure_protobuf()


@pytest.fixture(scope="module")
def sm():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as m

    return m


def test_value_state_get_wire_bytes(sm):
    """Exact wire encoding, hand-derived from the public spec:
    StateRequest.stateVariableRequest (field 3, LEN) >
    ValueStateCall (field 1) > stateName 'totals' (field 1) +
    get (field 3, empty message)."""
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(
                stateName="totals", get=sm.Get()
            )
        )
    )
    assert req.SerializeToString().hex() == "1a0c0a0a0a06746f74616c731a00"


def test_parse_roundtrip_and_oneof(sm):
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"\x00\x01grp")
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert back.implicitGroupingKeyRequest.setImplicitKey.key == b"\x00\x01grp"


def test_attribute_set_and_ttl_vivification(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "s1"
    cmd.schema = "sch"
    cmd.ttl.durationMs = 5000
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == "s1"
    assert back.ttl.durationMs == 5000
    assert back.HasField("ttl")


def test_untouched_submessage_not_serialized(sm):
    """Reading cmd.ttl without writing must not put a TTL config on
    the wire — a fabricated durationMs=0 would enable instant-expiry
    TTL on the JVM side."""
    cmd = sm.StateCallCommand()
    cmd.stateName = "s2"
    _ = cmd.ttl  # read-only access
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert not back.HasField("ttl")


def test_enum_constants_and_handle_state(sm):
    assert (
        sm.PRE_INIT,
        sm.CREATED,
        sm.INITIALIZED,
        sm.DATA_PROCESSED,
        sm.TIMER_PROCESSED,
        sm.CLOSED,
    ) == (0, 1, 2, 3, 4, 5)
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.setHandleState.state == 3


def test_repeated_bytes_and_bool(sm):
    msg = sm.AppendList(value=[b"a", b"bb", b"ccc"], fetchWithArrow=True)
    back = sm.AppendList()
    back.ParseFromString(msg.SerializeToString())
    assert list(back.value) == [b"a", b"bb", b"ccc"]
    assert back.fetchWithArrow is True


def test_repeated_message_and_negative_int(sm):
    resp = sm.StateResponseWithMapIterator(
        statusCode=-3,
        errorMessage="boom",
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(resp.SerializeToString())
    assert back.statusCode == -3
    assert back.errorMessage == "boom"
    assert [(p.key, p.value) for p in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert back.requireNextFetch is True


def test_long_value_and_unknown_field_skip(sm):
    lr = sm.StateResponseWithLongTypeVal(statusCode=0, value=1755181000000)
    data = lr.SerializeToString()
    # splice an unknown field (number 15, varint) in front — parsers
    # must skip it (forward compatibility)
    data = bytes([15 << 3 | 0, 0x2A]) + data
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(data)
    assert back.value == 1755181000000


def test_default_scalars_not_serialized(sm):
    """proto3: scalar fields at default value stay off the wire."""
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    assert sm.Exists().SerializeToString() == b""


@pytest.mark.skipif(MODE != "fallback", reason="only exercising the shim")
def test_fallback_is_the_vendored_module():
    import google.protobuf

    assert "protofallback" in google.protobuf.__file__
    assert any("protofallback" in p for p in sys.path)


# --- property-based roundtrips (hypothesis) ---------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    err=st.text(max_size=40),
    val=st.binary(max_size=60),
)
def test_roundtrip_state_response(status, err, val):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.StateResponse(statusCode=status, errorMessage=err, value=val)
    back = sm.StateResponse()
    back.ParseFromString(msg.SerializeToString())
    assert (back.statusCode, back.errorMessage, back.value) == (
        status,
        err,
        val,
    )


@settings(max_examples=200, deadline=None)
@given(v=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_roundtrip_int64_full_range(v):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.StateResponseWithLongTypeVal(value=v)
    back = sm.StateResponseWithLongTypeVal()
    back.ParseFromString(msg.SerializeToString())
    assert back.value == v


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(st.binary(max_size=30), max_size=10),
    fetch=st.booleans(),
)
def test_roundtrip_repeated_bytes(vals, fetch):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.StateResponseWithListGet(
        statusCode=0, value=vals, requireNextFetch=fetch
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(msg.SerializeToString())
    assert list(back.value) == vals
    assert back.requireNextFetch == fetch


@settings(max_examples=100, deadline=None)
@given(
    name=st.text(max_size=30),
    schema=st.text(max_size=60),
    ttl=st.one_of(st.none(), st.integers(min_value=0, max_value=2**40)),
)
def test_roundtrip_state_call_command(name, schema, ttl):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    cmd = sm.StateCallCommand()
    cmd.stateName = name
    cmd.schema = schema
    if ttl is not None:
        cmd.ttl.durationMs = ttl
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == name
    assert back.schema == schema
    assert back.HasField("ttl") == (ttl is not None)
    if ttl is not None:
        assert back.ttl.durationMs == ttl


@settings(max_examples=100, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.binary(max_size=20), st.binary(max_size=20)),
        max_size=8,
    )
)
def test_roundtrip_map_iterator_pairs(pairs):
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.StateResponseWithMapIterator(
        kvPair=[sm.KeyAndValuePair(key=k, value=v) for k, v in pairs]
    )
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(msg.SerializeToString())
    assert [(p.key, p.value) for p in back.kvPair] == pairs


def test_append_into_vivified_child_serializes(sm):
    """Mutating an auto-vivified sub-message ONLY through a repeated
    field append must still mark it present on the wire (plain-list
    semantics would silently drop the payload)."""
    msg = sm.StateResponseWithMapIterator()
    resp = sm.StateRequest()
    # vivify a presence-tracked child purely via repeated append
    call = sm.AppendList()
    call.value.append(b"x")
    call.value.extend([b"y"])
    lsc = sm.ListStateCall(stateName="s", appendList=call)
    back = sm.ListStateCall()
    back.ParseFromString(lsc.SerializeToString())
    assert list(back.appendList.value) == [b"x", b"y"]
    # and via a stored-then-appended list on a parsed message
    msg.kvPair.append(sm.KeyAndValuePair(key=b"k", value=b"v"))
    back2 = sm.StateResponseWithMapIterator()
    back2.ParseFromString(msg.SerializeToString())
    assert [(p.key, p.value) for p in back2.kvPair] == [(b"k", b"v")]


def test_merge_clears_oneof_siblings(sm):
    """Parsing a message-typed oneof member over a message that holds
    a different member must discard the old one (last-writer-wins),
    matching real protobuf merge semantics."""
    a = sm.StateVariableRequest(
        valueStateCall=sm.ValueStateCall(stateName="v", get=sm.Get())
    )
    b = sm.StateVariableRequest(
        listStateCall=sm.ListStateCall(
            stateName="l", listStateGet=sm.ListStateGet(iteratorId="i")
        )
    )
    a.MergeFromString(b.SerializeToString())
    assert a.WhichOneof("method") == "listStateCall"
    # serialization carries exactly one member
    back = sm.StateVariableRequest()
    back.ParseFromString(a.SerializeToString())
    assert back.WhichOneof("method") == "listStateCall"
    assert back.listStateCall.stateName == "l"


def test_touchlist_iadd_and_mutators_mark_presence(sm):
    """ADVICE r04: '+=' (list.__iadd__), pop/remove/clear and slice
    deletion must all route through the touch callback — an append
    path that bypasses it silently drops the payload from the wire."""
    msg = sm.ListStateCall(stateName="s")
    msg.appendList.value += [b"a", b"b"]  # __iadd__, not extend()
    back = sm.ListStateCall()
    back.ParseFromString(msg.SerializeToString())
    assert list(back.appendList.value) == [b"a", b"b"]
    # the remaining mutators keep the container live too
    lst = msg.appendList.value
    lst.pop()
    lst.remove(b"a")
    lst += [b"z"]
    back2 = sm.ListStateCall()
    back2.ParseFromString(msg.SerializeToString())
    assert list(back2.appendList.value) == [b"z"]


def test_reparented_submessage_tracks_both_parents(sm):
    """ADVICE r04: assigning one sub-message into a second parent must
    not un-track the first — a later mutation through the shared child
    serializes from BOTH parents (real protobuf copies on assignment,
    so sharing can only arise here; composing callbacks keeps every
    parent correct)."""
    child = sm.ValueStateCall(stateName="v")
    a = sm.StateVariableRequest()
    b = sm.StateVariableRequest()
    a.valueStateCall = child
    b.valueStateCall = child
    child.stateName = "renamed"
    for parent in (a, b):
        back = sm.StateVariableRequest()
        back.ParseFromString(parent.SerializeToString())
        assert back.valueStateCall.stateName == "renamed"


def test_ensure_protobuf_with_cached_namespace_google(monkeypatch):
    """ADVICE r04: a 'google' NAMESPACE package cached in sys.modules
    (e.g. google-auth installed without protobuf) must not defeat the
    fallback — ensure_protobuf grafts the vendor dir onto the cached
    module's __path__ and the retry import succeeds."""
    import types

    import det_module_spark.streaming.state as st

    saved = {
        k: sys.modules.get(k)
        for k in list(sys.modules)
        if k == "google" or k.startswith("google.")
    }
    try:
        for k in saved:
            sys.modules.pop(k, None)
        ns = types.ModuleType("google")
        ns.__path__ = ["/nonexistent/site-packages/google"]  # namespace-ish
        sys.modules["google"] = ns
        monkeypatch.setattr(st, "PROTOBUF_MODE", None)
        assert st.ensure_protobuf() == "fallback"
        import google.protobuf  # noqa: F401 - resolves via grafted path

        assert any("protofallback" in p for p in sys.modules["google"].__path__)
    finally:
        for k in list(sys.modules):
            if k == "google" or k.startswith("google."):
                sys.modules.pop(k, None)
        sys.modules.update({k: v for k, v in saved.items() if v is not None})
