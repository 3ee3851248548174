"""Typed error hierarchy.

The reference uses a boost::exception hierarchy with typed info tags
(reference: core/src/exception.hh:29-73).  We carry the same diagnostic
payloads as keyword attributes so CLI error output can cite file / line /
seqid / taxid context.
"""


class TaxtkError(Exception):
    def __init__(self, message: str = "", **info):
        super().__init__(message)
        self.message = message
        self.info = info

    def __str__(self):
        parts = [self.message] if self.message else []
        parts.extend(f"[{k}={v}]" for k, v in self.info.items())
        return " ".join(parts) or self.__class__.__name__


class ParsingError(TaxtkError):
    pass


class TaxonNotFound(TaxtkError):
    pass


class SequenceNotFound(TaxtkError):
    pass


class EOFError_(TaxtkError):
    pass


class FileError(TaxtkError):
    pass
