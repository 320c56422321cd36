"""Runtime-version gate: the shim accepts any generated code version.

The real runtime raises when gencode is newer than the runtime; this
shim is maintained against the wire format (stable since proto3), so
the validation is a no-op by design.
"""


class Domain:
    PUBLIC = 1
    GOOGLE_INTERNAL = 2


class VersionError(Exception):
    pass


def ValidateProtobufRuntimeVersion(
    domain, major, minor, patch, suffix, location
):  # noqa: N802 (protobuf public API name)
    return None
