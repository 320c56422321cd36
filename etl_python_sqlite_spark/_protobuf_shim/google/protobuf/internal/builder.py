"""Generated-code builder (shim): the two entry points every modern
``*_pb2.py`` calls. Reproduces the real builder's module-global
contract: ``_FOO`` / ``_FOO_BAR`` descriptor globals, one message class
per descriptor (nested classes as attributes), enum wrapper objects, and
top-level enum VALUE constants injected into the module namespace (the
pyspark state clients read ``stateMessage.PRE_INIT`` etc.)."""

from __future__ import annotations

from google.protobuf import symbol_database
from google.protobuf.message import Message


class EnumTypeWrapper:
    def __init__(self, enum_descriptor):
        self.DESCRIPTOR = enum_descriptor
        for v in enum_descriptor.values:
            setattr(self, v.name, v.number)

    def Name(self, number):  # noqa: N802
        return self.DESCRIPTOR.values_by_number[number].name

    def Value(self, name):  # noqa: N802
        return self.DESCRIPTOR.values_by_name[name].number

    def keys(self):
        return [v.name for v in self.DESCRIPTOR.values]

    def values(self):
        return [v.number for v in self.DESCRIPTOR.values]

    def items(self):
        return [(v.name, v.number) for v in self.DESCRIPTOR.values]


def _descriptor_key(full_name: str, package: str) -> str:
    rel = full_name[len(package) + 1 :] if package and full_name.startswith(package + ".") else full_name
    return "_" + rel.replace(".", "_").upper()


def _walk_messages(descriptors):
    for d in descriptors:
        yield d
        yield from _walk_messages(d.nested_types)


def BuildMessageAndEnumDescriptors(file_des, module_globals):  # noqa: N802
    package = file_des.package
    for d in _walk_messages(file_des.message_types_by_name.values()):
        module_globals[_descriptor_key(d.full_name, package)] = d
        for ed in d.enum_types:
            module_globals[_descriptor_key(ed.full_name, package)] = ed
    for ed in file_des.enum_types_by_name.values():
        module_globals[_descriptor_key(ed.full_name, package)] = ed


def _make_message_class(descriptor, module_name):
    attrs = {"DESCRIPTOR": descriptor, "__module__": module_name}
    for nd in descriptor.nested_types:
        attrs[nd.name] = _make_message_class(nd, module_name)
    for ed in descriptor.enum_types:
        wrapper = EnumTypeWrapper(ed)
        attrs[ed.name] = wrapper
        for v in ed.values:
            attrs[v.name] = v.number
    cls = type(descriptor.name, (Message,), attrs)
    descriptor._concrete_class = cls
    symbol_database.Default().RegisterMessage(cls)
    return cls


def BuildTopDescriptorsAndMessages(file_des, module_name, module_globals):  # noqa: N802
    for d in file_des.message_types_by_name.values():
        module_globals[d.name] = _make_message_class(d, module_name)
    for ed in file_des.enum_types_by_name.values():
        wrapper = EnumTypeWrapper(ed)
        module_globals[ed.name] = wrapper
        for v in ed.values:
            module_globals[v.name] = v.number
