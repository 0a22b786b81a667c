"""Golden micro-fixtures — log texts and pinned expectations.

The texts mirror the reference's test corpus (/root/reference/testsource/
logs/*.log) and the expectations mirror its pinned test values
(tests/test_convert.py:247-311, tests/test_db.py:702-718). They are test
DATA, reproduced so the parse contract is checkable hermetically.
"""

from datetime import datetime

ONE_LINE_LOG = "INFO    | jvm 1 | 2022/07/11 09:12:02 | ttl.test | SMB | Exec proxy"

TWO_LINE_SVC = (
    "INFO    | jvm 1 | 2022/07/11 09:12:02 | ttl.test | SMB | Exec proxy\n"
    "WARN    | jvm 1 | 2022/07/11 09:13:01 | ttl.test | async | FileIO"
)

MULTI_LINE_LOG = (
    "INFO | This is a log\n"
    "ERROR | This is an error log\n"
    "    with multiple lines\n"
    "    and more lines\n"
    "INFO | And this is a separate log"
)

BAD_TIMESTAMP_LOG = "INFO    | jvm 1 | 2022/07/1x 09:12:02 | ttl.test | SMB | Exec proxy"

SIMPLE_SVC = (
    "INFO    | jvm 1 | 2022/07/11 09:12:02 | ttl.test | SMB | Exec proxy\n"
    "INFO\t| jvm 1 | 2022/07/11 09:12:55 | SecondaryMonitor -> {path: /path/secondary, number: 2361852362752}\n"
    "WARN    | jvm 1 | 2022/07/11 09:13:01 | ttl.test | async | FileIO\n"
    "ERROR   | jvm 1 | 2022/07/11 09:14:51 | ttl.test | event | error doing reconnect...\n"
    "java.io.IOException: org.Exception: ErrorCode = Connection for /locks\n"
    "\tat ttl.test.create(lock.java:2)\n"
    "\tat ttl.test.reconnect(lock.java:99)\n"
    "\tat ttl.test.process(lock.java:101)\n"
    "\tat org.processEvent(connect.java:500)\n"
    "\tat org.run(connect.java:200)\n"
    "Caused by: org.Exception: ErrorCode = Connection for /locks\n"
    "\tat org.Exception.create(Exception.java:122)\n"
    "\tat org.Exception.create(Exception.java:540)\n"
    "\tat org.exists(exists.java:2000)\n"
    "\tat org.exists(exists.java:2079)\n"
    "\tat ttl.test.create(Lock.java:720)\n"
    "\t... 4 more\n"
    "INFO   | jvm 1 | 2022/07/11 09:15:51 | org.connect | process | more messages"
)

SIMPLE_SVC_STACKTRACE_MESSAGE = (
    "error doing reconnect...; java.io.IOException: org.Exception: "
    "ErrorCode = Connection for /locks; "
    "at ttl.test.create(lock.java:2); "
    "at ttl.test.reconnect(lock.java:99); "
    "at ttl.test.process(lock.java:101); "
    "at org.processEvent(connect.java:500); "
    "at org.run(connect.java:200); "
    "Caused by: org.Exception: ErrorCode = Connection for /locks; "
    "at org.Exception.create(Exception.java:122); "
    "at org.Exception.create(Exception.java:540); "
    "at org.exists(exists.java:2000); "
    "at org.exists(exists.java:2079); "
    "at ttl.test.create(Lock.java:720); "
    "... 4 more"
)

SIMPLE_SVC_EXPECTED = [
    # (severity, jvm, datetime, source, type, message)
    ("INFO", "jvm 1", datetime(2022, 7, 11, 9, 12, 2), "ttl.test", "SMB", "Exec proxy"),
    (
        "INFO",
        "jvm 1",
        datetime(2022, 7, 11, 9, 12, 55),
        None,
        None,
        "SecondaryMonitor -> {path: /path/secondary, number: 2361852362752}",
    ),
    ("WARN", "jvm 1", datetime(2022, 7, 11, 9, 13, 1), "ttl.test", "async", "FileIO"),
    (
        "ERROR",
        "jvm 1",
        datetime(2022, 7, 11, 9, 14, 51),
        "ttl.test",
        "event",
        SIMPLE_SVC_STACKTRACE_MESSAGE,
    ),
    (
        "INFO",
        "jvm 1",
        datetime(2022, 7, 11, 9, 15, 51),
        "org.connect",
        "process",
        "more messages",
    ),
]
