"""Error codes mirroring Source/API/EbSvtAv1ErrorCodes.h."""

import enum


class ErrorCode(enum.IntEnum):
    ERROR_NONE = 0
    DECODE_ERROR = 0x40001004
    ERROR_INSUFFICIENT_RESOURCES = 0x80001000
    ERROR_UNDEFINED = 0x80001001
    ERROR_INVALID_COMPONENT = 0x80001004
    ERROR_BAD_PARAMETER = 0x80001005
    ERROR_DESTROY_THREAD_FAILED = 0x80002012
    ERROR_SEMAPHORE_UNRESPONSIVE = 0x80002021
    ERROR_DESTROY_SEMAPHORE_FAILED = 0x80002022
    ERROR_CREATE_MUTEX_FAILED = 0x80002030
    ERROR_MUTEX_UNRESPONSIVE = 0x80002031
    ERROR_DESTROY_MUTEX_FAILED = 0x80002032
    NO_ERROR_EMPTY_QUEUE = 0x80002033
    NO_ERROR_FIFO_SHUTDOWN = 0x80002034


class SvtAv1Error(Exception):
    """Exception carrying an ErrorCode (the API boundary's EbErrorType)."""

    def __init__(self, code: ErrorCode, message: str = ""):
        self.code = code
        super().__init__(f"{code.name}: {message}" if message else code.name)
