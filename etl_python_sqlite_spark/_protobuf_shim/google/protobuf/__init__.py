"""Minimal pure-stdlib protobuf runtime (see etl_python_sqlite_spark.protoshim).

Implements, from the public Protocol Buffers documentation only, the
runtime surface that ``protoc``-generated ``*_pb2.py`` modules and
their consumers use: descriptor parsing, message classes with proto3
semantics, and the binary wire format. NOT a general replacement for
the real package — installed only when ``google.protobuf`` is absent.
"""

__version__ = "6.33.0"
__shim__ = True
