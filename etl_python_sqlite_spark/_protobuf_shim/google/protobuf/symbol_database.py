"""Symbol database shim: generated modules grab the default instance and
(through the builder) register message classes; consumers here never
query it, so registration is a simple dict."""


class SymbolDatabase:
    def __init__(self):
        self._classes = {}

    def RegisterMessage(self, cls):  # noqa: N802
        self._classes[cls.DESCRIPTOR.full_name] = cls
        return cls

    def GetSymbol(self, name):  # noqa: N802
        return self._classes[name]


_DEFAULT = SymbolDatabase()


def Default():  # noqa: N802
    return _DEFAULT
