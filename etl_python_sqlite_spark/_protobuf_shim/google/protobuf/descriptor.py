"""Descriptor object model (shim): plain-Python mirrors of the real
runtime's descriptor classes, carrying exactly what the message runtime
and generated modules touch. Type/label codes are the public
``descriptor.proto`` enum values."""

_USE_C_DESCRIPTORS = False


class FieldDescriptor:
    # FieldDescriptorProto.Type (public descriptor.proto)
    TYPE_DOUBLE = 1
    TYPE_FLOAT = 2
    TYPE_INT64 = 3
    TYPE_UINT64 = 4
    TYPE_INT32 = 5
    TYPE_FIXED64 = 6
    TYPE_FIXED32 = 7
    TYPE_BOOL = 8
    TYPE_STRING = 9
    TYPE_GROUP = 10
    TYPE_MESSAGE = 11
    TYPE_BYTES = 12
    TYPE_UINT32 = 13
    TYPE_ENUM = 14
    TYPE_SFIXED32 = 15
    TYPE_SFIXED64 = 16
    TYPE_SINT32 = 17
    TYPE_SINT64 = 18
    # FieldDescriptorProto.Label
    LABEL_OPTIONAL = 1
    LABEL_REQUIRED = 2
    LABEL_REPEATED = 3

    def __init__(
        self,
        name,
        number,
        type,  # noqa: A002 (protobuf public attr name)
        label,
        type_name="",
        json_name="",
        oneof_index=None,
        proto3_optional=False,
    ):
        self.name = name
        self.number = number
        self.type = type
        self.label = label
        self.type_name = type_name
        self.json_name = json_name or name
        self.oneof_index = oneof_index
        self.proto3_optional = proto3_optional
        self.message_type = None  # resolved Descriptor for TYPE_MESSAGE
        self.enum_type = None  # resolved EnumDescriptor for TYPE_ENUM
        self.containing_oneof = None  # OneofDescriptor (incl. synthetic)
        self.containing_type = None

    @property
    def is_repeated(self):
        return self.label == self.LABEL_REPEATED

    @property
    def has_presence(self):
        """proto3: message fields, oneof members (incl. synthetic
        `optional` oneofs) track explicit presence; plain scalars do
        not."""
        return (
            not self.is_repeated
            and (
                self.type == self.TYPE_MESSAGE
                or self.containing_oneof is not None
            )
        )

    def __repr__(self):
        return f"<FieldDescriptor {self.name}={self.number}>"


class OneofDescriptor:
    def __init__(self, name):
        self.name = name
        self.fields = []
        self.containing_type = None

    def __repr__(self):
        return f"<OneofDescriptor {self.name}>"


class EnumValueDescriptor:
    def __init__(self, name, number):
        self.name = name
        self.number = number


class EnumDescriptor:
    def __init__(self, name, full_name, values):
        self.name = name
        self.full_name = full_name
        self.values = values
        self.values_by_name = {v.name: v for v in values}
        self.values_by_number = {}
        for v in values:  # first name wins on aliases
            self.values_by_number.setdefault(v.number, v)
        self.containing_type = None

    def __repr__(self):
        return f"<EnumDescriptor {self.full_name}>"


class Descriptor:
    def __init__(self, name, full_name):
        self.name = name
        self.full_name = full_name
        self.fields = []
        self.fields_by_name = {}
        self.fields_by_number = {}
        self.oneofs = []
        self.oneofs_by_name = {}
        self.nested_types = []
        self.nested_types_by_name = {}
        self.enum_types = []
        self.enum_types_by_name = {}
        self.containing_type = None
        self._concrete_class = None  # filled by the builder

    def add_field(self, fd):
        fd.containing_type = self
        self.fields.append(fd)
        self.fields_by_name[fd.name] = fd
        self.fields_by_number[fd.number] = fd

    def __repr__(self):
        return f"<Descriptor {self.full_name}>"


class FileDescriptor:
    def __init__(self, name, package, serialized_pb):
        self.name = name
        self.package = package
        self.serialized_pb = serialized_pb
        self.message_types_by_name = {}
        self.enum_types_by_name = {}
        self.dependencies = []
        self._loaded_options = None

    def __repr__(self):
        return f"<FileDescriptor {self.name}>"
