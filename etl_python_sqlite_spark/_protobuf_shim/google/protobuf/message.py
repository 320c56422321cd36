"""proto3 message runtime (shim): binary wire format + field semantics.

Implements the public "Protocol Buffers Encoding" spec: varint tags
``(field_number << 3) | wire_type``, two's-complement 64-bit varints for
negative ints, zigzag for sint*, little-endian fixed32/64, and
length-delimited strings/bytes/messages/packed-repeated-scalars.

proto3 semantics implemented: implicit presence for plain scalars (a
default-valued field is neither serialized nor distinguishable from an
unset one), explicit presence for message fields and oneof members
(incl. the synthetic oneofs behind proto3 ``optional``), last-value-wins
+ submessage-merge on repeated occurrences during parse, unknown fields
skipped, and the auto-vivified submessage write-through (``a.b.c = 1``
marks ``b`` present on its parent) that generated-code consumers rely
on.
"""

from __future__ import annotations

import struct

from google.protobuf.descriptor import FieldDescriptor as FD


class Error(Exception):
    pass


class DecodeError(Error):
    pass


class EncodeError(Error):
    pass


WIRETYPE_VARINT = 0
WIRETYPE_FIXED64 = 1
WIRETYPE_LENGTH_DELIMITED = 2
WIRETYPE_START_GROUP = 3
WIRETYPE_END_GROUP = 4
WIRETYPE_FIXED32 = 5

_VARINT_TYPES = {
    FD.TYPE_INT32,
    FD.TYPE_INT64,
    FD.TYPE_UINT32,
    FD.TYPE_UINT64,
    FD.TYPE_BOOL,
    FD.TYPE_ENUM,
    FD.TYPE_SINT32,
    FD.TYPE_SINT64,
}
_FIXED64_TYPES = {FD.TYPE_FIXED64, FD.TYPE_SFIXED64, FD.TYPE_DOUBLE}
_FIXED32_TYPES = {FD.TYPE_FIXED32, FD.TYPE_SFIXED32, FD.TYPE_FLOAT}
_LEN_TYPES = {FD.TYPE_STRING, FD.TYPE_BYTES, FD.TYPE_MESSAGE}


def wire_type_of(ftype: int) -> int:
    if ftype in _VARINT_TYPES:
        return WIRETYPE_VARINT
    if ftype in _FIXED64_TYPES:
        return WIRETYPE_FIXED64
    if ftype in _FIXED32_TYPES:
        return WIRETYPE_FIXED32
    if ftype in _LEN_TYPES:
        return WIRETYPE_LENGTH_DELIMITED
    raise EncodeError(f"unsupported field type {ftype}")


def encode_varint(value: int) -> bytes:
    if value < 0:
        value &= (1 << 64) - 1  # two's complement, always 10 bytes
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(buf, pos: int):
    result = shift = 0
    while True:
        if pos >= len(buf):
            raise DecodeError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise DecodeError("varint too long")


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed(v: int, bits: int) -> int:
    v &= (1 << bits) - 1
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def skip_field(buf, pos: int, wire_type: int) -> int:
    """Advance past an unknown field's payload (spec: unknown fields are
    skippable by wire type alone)."""
    if wire_type == WIRETYPE_VARINT:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire_type == WIRETYPE_FIXED64:
        return pos + 8
    if wire_type == WIRETYPE_FIXED32:
        return pos + 4
    if wire_type == WIRETYPE_LENGTH_DELIMITED:
        ln, pos = decode_varint(buf, pos)
        return pos + ln
    if wire_type == WIRETYPE_START_GROUP:
        while True:
            tag, pos = decode_varint(buf, pos)
            wt = tag & 7
            if wt == WIRETYPE_END_GROUP:
                return pos
            pos = skip_field(buf, pos, wt)
    raise DecodeError(f"cannot skip wire type {wire_type}")


def _encode_scalar(ftype: int, value) -> bytes:
    if ftype in (FD.TYPE_INT32, FD.TYPE_INT64, FD.TYPE_UINT32, FD.TYPE_UINT64):
        return encode_varint(int(value))
    if ftype == FD.TYPE_BOOL:
        return encode_varint(1 if value else 0)
    if ftype == FD.TYPE_ENUM:
        return encode_varint(int(value))
    if ftype == FD.TYPE_SINT32 or ftype == FD.TYPE_SINT64:
        return encode_varint(_zigzag_encode(int(value)))
    if ftype == FD.TYPE_DOUBLE:
        return struct.pack("<d", float(value))
    if ftype == FD.TYPE_FLOAT:
        return struct.pack("<f", float(value))
    if ftype == FD.TYPE_FIXED64:
        return struct.pack("<Q", int(value))
    if ftype == FD.TYPE_SFIXED64:
        return struct.pack("<q", int(value))
    if ftype == FD.TYPE_FIXED32:
        return struct.pack("<I", int(value))
    if ftype == FD.TYPE_SFIXED32:
        return struct.pack("<i", int(value))
    raise EncodeError(f"not a scalar type: {ftype}")


def _decode_scalar(ftype: int, buf, pos: int):
    if ftype in _VARINT_TYPES:
        raw, pos = decode_varint(buf, pos)
        if ftype in (FD.TYPE_INT32, FD.TYPE_ENUM):
            return _to_signed(raw, 32), pos
        if ftype == FD.TYPE_INT64:
            return _to_signed(raw, 64), pos
        if ftype == FD.TYPE_BOOL:
            return bool(raw), pos
        if ftype == FD.TYPE_SINT32 or ftype == FD.TYPE_SINT64:
            return _zigzag_decode(raw), pos
        return raw, pos  # uint32/uint64
    if ftype == FD.TYPE_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if ftype == FD.TYPE_FLOAT:
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if ftype == FD.TYPE_FIXED64:
        return struct.unpack_from("<Q", buf, pos)[0], pos + 8
    if ftype == FD.TYPE_SFIXED64:
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if ftype == FD.TYPE_FIXED32:
        return struct.unpack_from("<I", buf, pos)[0], pos + 4
    if ftype == FD.TYPE_SFIXED32:
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    raise DecodeError(f"not a scalar type: {ftype}")


_SCALAR_DEFAULTS = {
    FD.TYPE_STRING: "",
    FD.TYPE_BYTES: b"",
    FD.TYPE_BOOL: False,
    FD.TYPE_DOUBLE: 0.0,
    FD.TYPE_FLOAT: 0.0,
}


def _default_for(fd):
    return _SCALAR_DEFAULTS.get(fd.type, 0)


def _coerce(fd, value):
    t = fd.type
    if t == FD.TYPE_STRING:
        if not isinstance(value, str):
            raise TypeError(f"{fd.name} expects str, got {type(value).__name__}")
        return value
    if t == FD.TYPE_BYTES:
        if isinstance(value, (bytes, bytearray, memoryview)):
            return bytes(value)
        raise TypeError(f"{fd.name} expects bytes, got {type(value).__name__}")
    if t == FD.TYPE_BOOL:
        return bool(value)
    if t in (FD.TYPE_DOUBLE, FD.TYPE_FLOAT):
        return float(value)
    return int(value)


class _RepeatedScalar(list):
    """list with protobuf's coercing append/extend; ``add`` is
    composite-only, matching the real containers."""

    def __init__(self, fd):
        super().__init__()
        self._fd = fd

    def append(self, value):
        super().append(_coerce(self._fd, value))

    def extend(self, values):
        for v in values:
            self.append(v)

    def MergeFrom(self, other):  # noqa: N802
        self.extend(other)


class _RepeatedComposite(list):
    def __init__(self, fd):
        super().__init__()
        self._fd = fd

    def add(self, **kwargs):
        msg = self._fd.message_type._concrete_class(**kwargs)
        super().append(msg)
        return msg

    def append(self, msg):
        self.add().CopyFrom(msg)

    def extend(self, msgs):
        for m in msgs:
            self.append(m)

    def MergeFrom(self, other):  # noqa: N802
        self.extend(other)


class Message:
    """Base class for generated messages (the builder subclasses this
    with ``DESCRIPTOR`` set). Field storage is a number→value dict;
    presence == membership for explicit-presence fields."""

    DESCRIPTOR = None
    __slots__ = ("_values", "_cached", "_parent")

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_cached", {})
        object.__setattr__(self, "_parent", None)
        for name, value in kwargs.items():
            if value is None:
                continue
            fd = self.DESCRIPTOR.fields_by_name.get(name)
            if fd is None:
                raise ValueError(
                    f'Protocol message {self.DESCRIPTOR.name} has no "{name}" field.'
                )
            if fd.is_repeated:
                getattr(self, name).extend(value)
            else:
                setattr(self, name, value)

    # -- attribute protocol -------------------------------------------------

    def __getattr__(self, name):
        desc = type(self).DESCRIPTOR
        fd = desc.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f"'{desc.name}' object has no attribute '{name}'"
            )
        values = self._values
        if fd.is_repeated:
            if fd.number not in values:
                cls = _RepeatedComposite if fd.type == FD.TYPE_MESSAGE else _RepeatedScalar
                values[fd.number] = cls(fd)
            return values[fd.number]
        if fd.type == FD.TYPE_MESSAGE:
            if fd.number in values:
                return values[fd.number]
            cached = self._cached
            if fd.number not in cached:
                child = fd.message_type._concrete_class()
                object.__setattr__(child, "_parent", (self, fd))
                cached[fd.number] = child
            return cached[fd.number]
        return values.get(fd.number, _default_for(fd))

    def __setattr__(self, name, value):
        fd = type(self).DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f"'{type(self).DESCRIPTOR.name}' object has no attribute '{name}'"
            )
        if fd.is_repeated:
            raise AttributeError(
                f"Assignment not allowed to repeated field '{name}'"
            )
        if fd.type == FD.TYPE_MESSAGE:
            if not isinstance(value, Message):
                raise TypeError(f"{name} expects a message")
            stored = fd.message_type._concrete_class()
            stored.CopyFrom(value)
            self._set_field(fd, stored)
        else:
            self._set_field(fd, _coerce(fd, value))

    def _set_field(self, fd, value):
        if fd.containing_oneof is not None:
            for other in fd.containing_oneof.fields:
                if other.number != fd.number:
                    self._values.pop(other.number, None)
                    self._cached.pop(other.number, None)
        self._values[fd.number] = value
        self._cached.pop(fd.number, None)
        self._on_modified()

    def _on_modified(self):
        """Write-through for auto-vivified submessages: the first write
        to a detached child attaches it to (and marks it present on) its
        parent chain."""
        parent = self._parent
        if parent is not None:
            object.__setattr__(self, "_parent", None)
            pmsg, pfd = parent
            pmsg._set_field(pfd, self)

    # -- presence ------------------------------------------------------------

    def HasField(self, name):  # noqa: N802
        desc = type(self).DESCRIPTOR
        if name in desc.oneofs_by_name:
            return any(
                f.number in self._values
                for f in desc.oneofs_by_name[name].fields
            )
        fd = desc.fields_by_name.get(name)
        if fd is None:
            raise ValueError(f"unknown field {name!r}")
        if fd.is_repeated or not fd.has_presence:
            raise ValueError(
                f"field {name!r} does not track presence in proto3"
            )
        return fd.number in self._values

    def WhichOneof(self, oneof_name):  # noqa: N802
        oneof = type(self).DESCRIPTOR.oneofs_by_name.get(oneof_name)
        if oneof is None:
            raise ValueError(f"unknown oneof {oneof_name!r}")
        for f in oneof.fields:
            if f.number in self._values:
                return f.name
        return None

    def ListFields(self):  # noqa: N802
        out = []
        for fd in sorted(
            type(self).DESCRIPTOR.fields, key=lambda f: f.number
        ):
            v = self._values.get(fd.number)
            if v is None:
                continue
            if fd.is_repeated and not v:
                continue
            if not fd.is_repeated and not fd.has_presence and v == _default_for(fd):
                continue
            out.append((fd, v))
        return out

    def Clear(self):  # noqa: N802
        self._values.clear()
        self._cached.clear()

    def ClearField(self, name):  # noqa: N802
        fd = type(self).DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise ValueError(f"unknown field {name!r}")
        self._values.pop(fd.number, None)
        self._cached.pop(fd.number, None)

    def CopyFrom(self, other):  # noqa: N802
        if type(other).DESCRIPTOR is not type(self).DESCRIPTOR:
            raise TypeError("CopyFrom across message types")
        self.Clear()
        self.MergeFrom(other)

    def MergeFrom(self, other):  # noqa: N802
        for fd, v in other.ListFields():
            if fd.is_repeated:
                getattr(self, fd.name).MergeFrom(v)
            elif fd.type == FD.TYPE_MESSAGE:
                if fd.number in self._values:
                    self._values[fd.number].MergeFrom(v)
                else:
                    stored = fd.message_type._concrete_class()
                    stored.MergeFrom(v)
                    self._set_field(fd, stored)
            else:
                self._set_field(fd, v)

    # -- wire format ----------------------------------------------------------

    def SerializeToString(self, deterministic=True):  # noqa: N802
        out = bytearray()
        for fd in sorted(
            type(self).DESCRIPTOR.fields, key=lambda f: f.number
        ):
            v = self._values.get(fd.number)
            if v is None:
                continue
            if fd.is_repeated:
                if not v:
                    continue
                if fd.type == FD.TYPE_MESSAGE:
                    for el in v:
                        payload = el.SerializeToString()
                        out += encode_varint((fd.number << 3) | WIRETYPE_LENGTH_DELIMITED)
                        out += encode_varint(len(payload))
                        out += payload
                elif fd.type in (FD.TYPE_STRING, FD.TYPE_BYTES):
                    for el in v:
                        payload = el.encode("utf-8") if fd.type == FD.TYPE_STRING else el
                        out += encode_varint((fd.number << 3) | WIRETYPE_LENGTH_DELIMITED)
                        out += encode_varint(len(payload))
                        out += payload
                else:  # packed numeric (proto3 default)
                    payload = b"".join(_encode_scalar(fd.type, el) for el in v)
                    out += encode_varint((fd.number << 3) | WIRETYPE_LENGTH_DELIMITED)
                    out += encode_varint(len(payload))
                    out += payload
                continue
            if fd.type == FD.TYPE_MESSAGE:
                payload = v.SerializeToString()
                out += encode_varint((fd.number << 3) | WIRETYPE_LENGTH_DELIMITED)
                out += encode_varint(len(payload))
                out += payload
                continue
            if not fd.has_presence and v == _default_for(fd):
                continue  # proto3 implicit presence: defaults are absent
            if fd.type == FD.TYPE_STRING or fd.type == FD.TYPE_BYTES:
                payload = v.encode("utf-8") if fd.type == FD.TYPE_STRING else v
                out += encode_varint((fd.number << 3) | WIRETYPE_LENGTH_DELIMITED)
                out += encode_varint(len(payload))
                out += payload
            else:
                out += encode_varint((fd.number << 3) | wire_type_of(fd.type))
                out += _encode_scalar(fd.type, v)
        return bytes(out)

    def ByteSize(self):  # noqa: N802
        return len(self.SerializeToString())

    def ParseFromString(self, data):  # noqa: N802
        self.Clear()
        return self.MergeFromString(data)

    def MergeFromString(self, data):  # noqa: N802
        buf = memoryview(bytes(data))
        pos, end = 0, len(buf)
        desc = type(self).DESCRIPTOR
        while pos < end:
            tag, pos = decode_varint(buf, pos)
            number, wt = tag >> 3, tag & 7
            fd = desc.fields_by_number.get(number)
            if fd is None:
                pos = skip_field(buf, pos, wt)
                continue
            if fd.is_repeated:
                container = getattr(self, fd.name)
                if fd.type == FD.TYPE_MESSAGE:
                    ln, pos = decode_varint(buf, pos)
                    el = container.add()
                    el.MergeFromString(bytes(buf[pos : pos + ln]))
                    pos += ln
                elif fd.type in (FD.TYPE_STRING, FD.TYPE_BYTES):
                    ln, pos = decode_varint(buf, pos)
                    raw = bytes(buf[pos : pos + ln])
                    pos += ln
                    list.append(
                        container,
                        raw.decode("utf-8") if fd.type == FD.TYPE_STRING else raw,
                    )
                elif wt == WIRETYPE_LENGTH_DELIMITED:  # packed
                    ln, pos = decode_varint(buf, pos)
                    sub_end = pos + ln
                    while pos < sub_end:
                        v, pos = _decode_scalar(fd.type, buf, pos)
                        list.append(container, v)
                else:  # unpacked numeric element
                    v, pos = _decode_scalar(fd.type, buf, pos)
                    list.append(container, v)
                continue
            if fd.type == FD.TYPE_MESSAGE:
                ln, pos = decode_varint(buf, pos)
                if fd.number in self._values:
                    child = self._values[fd.number]
                else:
                    child = fd.message_type._concrete_class()
                    self._set_field(fd, child)
                child.MergeFromString(bytes(buf[pos : pos + ln]))
                pos += ln
            elif fd.type == FD.TYPE_STRING or fd.type == FD.TYPE_BYTES:
                ln, pos = decode_varint(buf, pos)
                raw = bytes(buf[pos : pos + ln])
                pos += ln
                self._set_field(
                    fd, raw.decode("utf-8") if fd.type == FD.TYPE_STRING else raw
                )
            else:
                v, pos = _decode_scalar(fd.type, buf, pos)
                self._set_field(fd, v)
        if pos != end:
            raise DecodeError("truncated message")
        return pos

    # -- misc -----------------------------------------------------------------

    def IsInitialized(self):  # noqa: N802
        return True  # proto3: no required fields

    def __eq__(self, other):
        if not isinstance(other, Message):
            return NotImplemented
        if type(other).DESCRIPTOR is not type(self).DESCRIPTOR:
            return False
        return self.ListFields() == other.ListFields()

    def __bool__(self):
        return True

    def __repr__(self):
        parts = []
        for fd, v in self.ListFields():
            parts.append(f"{fd.name}: {v!r}")
        return f"<{type(self).DESCRIPTOR.name} {' '.join(parts)}>"

    __str__ = __repr__
