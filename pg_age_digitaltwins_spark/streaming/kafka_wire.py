"""Minimal Kafka wire-protocol encoding: Produce v3 requests carrying
record-batch v2 sets, plus the response decoder — enough for a
broker-compatible QoS-style produce path with no client library.

Everything here follows the public Apache Kafka protocol guide
(https://kafka.apache.org/protocol): size-framed requests, big-endian
primitives, zigzag varints inside record batches, CRC-32C (Castagnoli)
over the batch body.  The reference's Kafka sink
(``Sinks/Kafka/KafkaEventSink.cs``) delegates this to Confluent.Kafka;
at Spark scale the native ``writeStream.format("kafka")`` path does —
this module exists so the driver-batch transport path (OLTP-sized by
contract) is a REAL protocol client, testable byte-for-byte.
"""

from __future__ import annotations

import struct

# ----------------------------------------------------------------------
# CRC-32C (Castagnoli, reflected poly 0x82F63B78) — table-driven
# ----------------------------------------------------------------------

def _make_crc32c_table() -> list[int]:
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# ----------------------------------------------------------------------
# primitive encoders
# ----------------------------------------------------------------------

def _i16(v: int) -> bytes:
    return struct.pack(">h", v)


def _i32(v: int) -> bytes:
    return struct.pack(">i", v)


def _i64(v: int) -> bytes:
    return struct.pack(">q", v)


def _string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _i16(len(b)) + b


def _nullable_string(s: str | None) -> bytes:
    return _i16(-1) if s is None else _string(s)


def _bytes(b: bytes) -> bytes:
    return _i32(len(b)) + b


def zigzag_varint(v: int) -> bytes:
    """Kafka record-field varint: zigzag then 7-bit little-endian."""
    z = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        out.append(b | (0x80 if z else 0))
        if not z:
            return bytes(out)


def read_zigzag_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


# ----------------------------------------------------------------------
# record batch v2
# ----------------------------------------------------------------------

def encode_record(offset_delta: int, ts_delta: int, key: bytes | None, value: bytes) -> bytes:
    body = (
        b"\x00"  # attributes
        + zigzag_varint(ts_delta)
        + zigzag_varint(offset_delta)
        + (zigzag_varint(-1) if key is None else zigzag_varint(len(key)) + key)
        + zigzag_varint(len(value))
        + value
        + zigzag_varint(0)  # headers count
    )
    return zigzag_varint(len(body)) + body


def encode_record_batch(
    records: list[tuple[bytes | None, bytes]], base_timestamp_ms: int = 0
) -> bytes:
    """records = [(key or None, value)] → one magic-2 batch at base
    offset 0 (the broker re-assigns offsets on append)."""
    recs = b"".join(
        encode_record(i, 0, k, v) for i, (k, v) in enumerate(records)
    )
    n = len(records)
    after_crc = (
        _i16(0)  # attributes: no compression, create-time
        + _i32(n - 1)  # lastOffsetDelta
        + _i64(base_timestamp_ms)  # baseTimestamp
        + _i64(base_timestamp_ms)  # maxTimestamp
        + _i64(-1)  # producerId
        + _i16(-1)  # producerEpoch
        + _i32(-1)  # baseSequence
        + _i32(n)
        + recs
    )
    body = (
        _i32(-1)  # partitionLeaderEpoch
        + b"\x02"  # magic
        + struct.pack(">I", crc32c(after_crc))  # unsigned CRC-32C
        + after_crc
    )
    return _i64(0) + _i32(len(body)) + body  # baseOffset + batchLength


# ----------------------------------------------------------------------
# SASL: Handshake v1 (api 17) + Authenticate v1 (api 36)
#
# The reference sink negotiates SASL PLAIN / OAuthBearer through
# Confluent.Kafka (``Sinks/Kafka/KafkaEventSink.cs:37-82``); these are
# the same spec-public exchanges over the existing size-framed codec
# (both APIs are non-flexible at these versions — no tagged fields).
# Auth payloads: PLAIN per RFC 4616 (``\0user\0pass``), OAUTHBEARER per
# RFC 7628 GS2 framing (``n,,\x01auth=Bearer <token>\x01\x01``).
# ----------------------------------------------------------------------

API_SASL_HANDSHAKE = 17
API_SASL_AUTHENTICATE = 36
ERR_UNSUPPORTED_SASL_MECHANISM = 33
ERR_SASL_AUTHENTICATION_FAILED = 58


def sasl_plain_bytes(username: str, password: str, authzid: str = "") -> bytes:
    """RFC 4616 PLAIN initial response: authzid NUL authcid NUL passwd."""
    return b"\x00".join(
        (authzid.encode("utf-8"), username.encode("utf-8"), password.encode("utf-8"))
    )


def oauthbearer_bytes(token: str, extensions: dict[str, str] | None = None) -> bytes:
    """RFC 7628 OAUTHBEARER initial client response (GS2 header ``n,,``)."""
    kvs = "\x01auth=Bearer " + token
    for k, v in (extensions or {}).items():
        kvs += f"\x01{k}={v}"
    return ("n,," + kvs + "\x01\x01").encode("utf-8")


def encode_sasl_handshake_request(
    correlation_id: int, client_id: str, mechanism: str
) -> bytes:
    header = (
        _i16(API_SASL_HANDSHAKE) + _i16(1) + _i32(correlation_id)
        + _nullable_string(client_id)
    )
    payload = header + _string(mechanism)
    return _i32(len(payload)) + payload


def decode_sasl_handshake_response(payload: bytes) -> dict:
    pos = 0
    corr = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    error_code = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    n = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    mechanisms = []
    for _ in range(max(n, 0)):
        ln = struct.unpack_from(">h", payload, pos)[0]; pos += 2
        mechanisms.append(payload[pos : pos + ln].decode()); pos += ln
    return {"correlation_id": corr, "error_code": error_code, "mechanisms": mechanisms}


def encode_sasl_authenticate_request(
    correlation_id: int, client_id: str, auth_bytes: bytes
) -> bytes:
    header = (
        _i16(API_SASL_AUTHENTICATE) + _i16(1) + _i32(correlation_id)
        + _nullable_string(client_id)
    )
    payload = header + _bytes(auth_bytes)
    return _i32(len(payload)) + payload


def decode_sasl_authenticate_response(payload: bytes) -> dict:
    pos = 0
    corr = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    error_code = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    mlen = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    error_message = None
    if mlen >= 0:
        error_message = payload[pos : pos + mlen].decode(); pos += mlen
    blen = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    auth = payload[pos : pos + max(blen, 0)]; pos += max(blen, 0)
    lifetime = struct.unpack_from(">q", payload, pos)[0]; pos += 8
    return {
        "correlation_id": corr,
        "error_code": error_code,
        "error_message": error_message,
        "auth_bytes": auth,
        "session_lifetime_ms": lifetime,
    }


# -- broker-side decoders/encoders (fake broker in tests) --------------

def decode_request_header(payload: bytes) -> tuple[dict, int]:
    """Non-flexible request header v1: api_key, api_version, correlation
    id, nullable client_id.  Returns (header, body_offset)."""
    pos = 0
    api_key, api_version = struct.unpack_from(">hh", payload, pos); pos += 4
    corr = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    cid_len = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    client_id = None
    if cid_len >= 0:
        client_id = payload[pos : pos + cid_len].decode(); pos += cid_len
    return (
        {"api_key": api_key, "api_version": api_version,
         "correlation_id": corr, "client_id": client_id},
        pos,
    )


def decode_sasl_handshake_request(payload: bytes) -> dict:
    header, pos = decode_request_header(payload)
    ln = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    header["mechanism"] = payload[pos : pos + ln].decode()
    return header


def encode_sasl_handshake_response(
    correlation_id: int, error_code: int = 0, mechanisms: tuple[str, ...] = ()
) -> bytes:
    payload = _i32(correlation_id) + _i16(error_code) + _i32(len(mechanisms))
    for m in mechanisms:
        payload += _string(m)
    return _i32(len(payload)) + payload


def decode_sasl_authenticate_request(payload: bytes) -> dict:
    header, pos = decode_request_header(payload)
    blen = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    header["auth_bytes"] = payload[pos : pos + max(blen, 0)]
    return header


def parse_sasl_plain(auth_bytes: bytes) -> tuple[str, str, str]:
    """auth_bytes → (authzid, username, password); raises on bad framing."""
    parts = auth_bytes.split(b"\x00")
    if len(parts) != 3:
        raise ValueError("malformed SASL PLAIN initial response")
    return tuple(p.decode("utf-8") for p in parts)  # type: ignore[return-value]


def parse_oauthbearer(auth_bytes: bytes) -> str:
    """OAUTHBEARER initial response → bearer token; raises on bad framing."""
    text = auth_bytes.decode("utf-8")
    if not text.startswith("n,,") or not text.endswith("\x01\x01"):
        raise ValueError("malformed OAUTHBEARER GS2 framing")
    for kv in text[3:].strip("\x01").split("\x01"):
        if kv.startswith("auth=Bearer "):
            return kv[len("auth=Bearer "):]
    raise ValueError("OAUTHBEARER response missing auth key-value")


def encode_sasl_authenticate_response(
    correlation_id: int,
    error_code: int = 0,
    error_message: str | None = None,
    auth_bytes: bytes = b"",
    session_lifetime_ms: int = 0,
) -> bytes:
    payload = (
        _i32(correlation_id)
        + _i16(error_code)
        + _nullable_string(error_message)
        + _bytes(auth_bytes)
        + _i64(session_lifetime_ms)
    )
    return _i32(len(payload)) + payload


# ----------------------------------------------------------------------
# Produce v3
# ----------------------------------------------------------------------

def encode_produce_request(
    correlation_id: int,
    client_id: str,
    topic: str,
    partition: int,
    record_batch: bytes,
    acks: int = 1,
    timeout_ms: int = 10000,
) -> bytes:
    header = _i16(0) + _i16(3) + _i32(correlation_id) + _nullable_string(client_id)
    body = (
        _nullable_string(None)  # transactional_id
        + _i16(acks)
        + _i32(timeout_ms)
        + _i32(1)  # topics
        + _string(topic)
        + _i32(1)  # partitions
        + _i32(partition)
        + _bytes(record_batch)
    )
    payload = header + body
    return _i32(len(payload)) + payload


def decode_produce_response(payload: bytes) -> dict:
    """payload = response WITHOUT the leading size frame.  Returns
    {correlation_id, topic, partition, error_code, base_offset}."""
    pos = 0
    corr = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    n_topics = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    assert n_topics >= 1
    tlen = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    topic = payload[pos : pos + tlen].decode(); pos += tlen
    n_parts = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    assert n_parts >= 1
    partition = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    error_code = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    base_offset = struct.unpack_from(">q", payload, pos)[0]; pos += 8
    return {
        "correlation_id": corr,
        "topic": topic,
        "partition": partition,
        "error_code": error_code,
        "base_offset": base_offset,
    }


# ----------------------------------------------------------------------
# decoding helpers for tests / fake brokers
# ----------------------------------------------------------------------

def decode_produce_request(payload: bytes) -> dict:
    """payload = request WITHOUT the size frame.  Parses the v3 header
    + body down to the decoded records, VERIFYING the batch CRC-32C."""
    pos = 0
    api_key, api_version = struct.unpack_from(">hh", payload, pos); pos += 4
    corr = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    cid_len = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    client_id = None
    if cid_len >= 0:
        client_id = payload[pos : pos + cid_len].decode(); pos += cid_len
    txn_len = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    if txn_len > 0:
        pos += txn_len
    acks = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    timeout = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    pos += 4  # topic array count (assume 1)
    tlen = struct.unpack_from(">h", payload, pos)[0]; pos += 2
    topic = payload[pos : pos + tlen].decode(); pos += tlen
    pos += 4  # partition array count (assume 1)
    partition = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    set_len = struct.unpack_from(">i", payload, pos)[0]; pos += 4
    batch = payload[pos : pos + set_len]

    # record batch v2
    bpos = 12  # baseOffset + batchLength
    bpos += 4  # partitionLeaderEpoch
    magic = batch[bpos]; bpos += 1
    crc_stored = struct.unpack_from(">I", batch, bpos)[0]; bpos += 4
    crc_actual = crc32c(batch[bpos:]) & 0xFFFFFFFF
    if magic != 2 or crc_stored != crc_actual:
        raise ValueError(
            f"bad record batch: magic={magic} crc_stored={crc_stored:#x} "
            f"crc_actual={crc_actual:#x}"
        )
    bpos += 2 + 4 + 8 + 8 + 8 + 2 + 4  # attrs..baseSequence
    n_records = struct.unpack_from(">i", batch, bpos)[0]; bpos += 4
    records = []
    for _ in range(n_records):
        _rlen, bpos = read_zigzag_varint(batch, bpos)
        bpos += 1  # attributes
        _ts, bpos = read_zigzag_varint(batch, bpos)
        _off, bpos = read_zigzag_varint(batch, bpos)
        klen, bpos = read_zigzag_varint(batch, bpos)
        key = None
        if klen >= 0:
            key = batch[bpos : bpos + klen]; bpos += klen
        vlen, bpos = read_zigzag_varint(batch, bpos)
        value = batch[bpos : bpos + vlen]; bpos += vlen
        n_headers, bpos = read_zigzag_varint(batch, bpos)
        assert n_headers == 0
        records.append((key, value))
    return {
        "api_key": api_key,
        "api_version": api_version,
        "correlation_id": corr,
        "client_id": client_id,
        "acks": acks,
        "timeout_ms": timeout,
        "topic": topic,
        "partition": partition,
        "records": records,
    }


def encode_produce_response(
    correlation_id: int, topic: str, partition: int = 0,
    error_code: int = 0, base_offset: int = 0,
) -> bytes:
    payload = (
        _i32(correlation_id)
        + _i32(1)
        + _string(topic)
        + _i32(1)
        + _i32(partition)
        + _i16(error_code)
        + _i64(base_offset)
        + _i64(-1)  # log_append_time
        + _i32(0)  # throttle_time_ms
    )
    return _i32(len(payload)) + payload
