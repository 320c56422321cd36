"""Descriptor pool (shim): parses the ``serialized_pb`` blob that
generated modules pass to ``AddSerializedFile`` — a serialized
``FileDescriptorProto`` — using a tiny table-driven reader over the
public ``descriptor.proto`` field numbers, then builds the descriptor
object graph and resolves cross-references (message/enum ``type_name``).
"""

from __future__ import annotations

from google.protobuf.descriptor import (
    Descriptor,
    EnumDescriptor,
    EnumValueDescriptor,
    FieldDescriptor,
    FileDescriptor,
    OneofDescriptor,
)
from google.protobuf.message import (
    WIRETYPE_LENGTH_DELIMITED,
    WIRETYPE_VARINT,
    DecodeError,
    decode_varint,
    skip_field,
)

# --- minimal FileDescriptorProto reader -------------------------------------
# field-number tables from the public descriptor.proto; values are
# (attr, kind) where kind is 'str' | 'int' | 'bool' | a nested table.

_ENUM_VALUE_PROTO = {1: ("name", "str"), 2: ("number", "int")}
_ENUM_PROTO = {1: ("name", "str"), 2: ("value", _ENUM_VALUE_PROTO)}
_ONEOF_PROTO = {1: ("name", "str")}
_FIELD_PROTO = {
    1: ("name", "str"),
    3: ("number", "int"),
    4: ("label", "int"),
    5: ("type", "int"),
    6: ("type_name", "str"),
    9: ("oneof_index", "int"),
    10: ("json_name", "str"),
    17: ("proto3_optional", "bool"),
}
_MESSAGE_PROTO: dict = {
    1: ("name", "str"),
    2: ("field", _FIELD_PROTO),
    4: ("enum_type", _ENUM_PROTO),
    8: ("oneof_decl", _ONEOF_PROTO),
}
_MESSAGE_PROTO[3] = ("nested_type", _MESSAGE_PROTO)  # self-recursive
_FILE_PROTO = {
    1: ("name", "str"),
    2: ("package", "str"),
    4: ("message_type", _MESSAGE_PROTO),
    5: ("enum_type", _ENUM_PROTO),
    12: ("syntax", "str"),
}

_REPEATED_KEYS = {
    "value",
    "field",
    "enum_type",
    "oneof_decl",
    "nested_type",
    "message_type",
}


def _read_proto(buf: bytes, table: dict) -> dict:
    """Table-driven read of one descriptor-family message into a dict;
    unknown fields (options, reserved ranges, source info) are skipped."""
    out: dict = {}
    pos, end = 0, len(buf)
    while pos < end:
        tag, pos = decode_varint(buf, pos)
        number, wt = tag >> 3, tag & 7
        entry = table.get(number)
        if entry is None:
            pos = skip_field(buf, pos, wt)
            continue
        attr, kind = entry
        if kind == "int" or kind == "bool":
            if wt != WIRETYPE_VARINT:
                raise DecodeError(f"descriptor field {attr}: bad wire type")
            v, pos = decode_varint(buf, pos)
            out[attr] = bool(v) if kind == "bool" else v
        else:
            if wt != WIRETYPE_LENGTH_DELIMITED:
                raise DecodeError(f"descriptor field {attr}: bad wire type")
            ln, pos = decode_varint(buf, pos)
            raw = bytes(buf[pos : pos + ln])
            pos += ln
            v = raw.decode("utf-8") if kind == "str" else _read_proto(raw, kind)
            if attr in _REPEATED_KEYS:
                out.setdefault(attr, []).append(v)
            else:
                out[attr] = v
    return out


# --- descriptor graph construction -------------------------------------------


class DescriptorPool:
    def __init__(self):
        self._files: dict[str, FileDescriptor] = {}
        self._messages: dict[str, Descriptor] = {}
        self._enums: dict[str, EnumDescriptor] = {}

    def _build_enum(self, proto: dict, prefix: str) -> EnumDescriptor:
        full = f"{prefix}.{proto['name']}" if prefix else proto["name"]
        values = [
            EnumValueDescriptor(v.get("name", ""), v.get("number", 0))
            for v in proto.get("value", [])
        ]
        ed = EnumDescriptor(proto["name"], full, values)
        self._enums[full] = ed
        return ed

    def _build_message(self, proto: dict, prefix: str) -> Descriptor:
        full = f"{prefix}.{proto['name']}" if prefix else proto["name"]
        d = Descriptor(proto["name"], full)
        self._messages[full] = d
        for oproto in proto.get("oneof_decl", []):
            oneof = OneofDescriptor(oproto.get("name", ""))
            oneof.containing_type = d
            d.oneofs.append(oneof)
            d.oneofs_by_name[oneof.name] = oneof
        for fproto in proto.get("field", []):
            fd = FieldDescriptor(
                name=fproto.get("name", ""),
                number=fproto.get("number", 0),
                type=fproto.get("type", 0),
                label=fproto.get("label", FieldDescriptor.LABEL_OPTIONAL),
                type_name=fproto.get("type_name", ""),
                json_name=fproto.get("json_name", ""),
                oneof_index=fproto.get("oneof_index"),
                proto3_optional=fproto.get("proto3_optional", False),
            )
            if fd.oneof_index is not None and fd.oneof_index < len(d.oneofs):
                oneof = d.oneofs[fd.oneof_index]
                fd.containing_oneof = oneof
                oneof.fields.append(fd)
            d.add_field(fd)
        for nproto in proto.get("nested_type", []):
            nd = self._build_message(nproto, full)
            nd.containing_type = d
            d.nested_types.append(nd)
            d.nested_types_by_name[nd.name] = nd
        for eproto in proto.get("enum_type", []):
            ed = self._build_enum(eproto, full)
            ed.containing_type = d
            d.enum_types.append(ed)
            d.enum_types_by_name[ed.name] = ed
        return d

    def _resolve(self, d: Descriptor) -> None:
        for fd in d.fields:
            if fd.type_name:
                key = fd.type_name.lstrip(".")
                if fd.type == FieldDescriptor.TYPE_MESSAGE:
                    fd.message_type = self._messages[key]
                elif fd.type == FieldDescriptor.TYPE_ENUM:
                    fd.enum_type = self._enums[key]
        for nd in d.nested_types:
            self._resolve(nd)

    def AddSerializedFile(self, serialized_pb: bytes) -> FileDescriptor:  # noqa: N802
        proto = _read_proto(serialized_pb, _FILE_PROTO)
        name = proto.get("name", "")
        if name in self._files:
            return self._files[name]
        package = proto.get("package", "")
        file_des = FileDescriptor(name, package, serialized_pb)
        for mproto in proto.get("message_type", []):
            d = self._build_message(mproto, package)
            file_des.message_types_by_name[d.name] = d
        for eproto in proto.get("enum_type", []):
            ed = self._build_enum(eproto, package)
            file_des.enum_types_by_name[ed.name] = ed
        for d in file_des.message_types_by_name.values():
            self._resolve(d)
        self._files[name] = file_des
        return file_des

    def FindMessageTypeByName(self, full_name: str) -> Descriptor:  # noqa: N802
        return self._messages[full_name]

    def FindEnumTypeByName(self, full_name: str) -> EnumDescriptor:  # noqa: N802
        return self._enums[full_name]


_DEFAULT = DescriptorPool()


def Default() -> DescriptorPool:  # noqa: N802
    return _DEFAULT
