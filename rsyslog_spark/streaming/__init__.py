from rsyslog_spark.streaming.sources import (
    imfile,
    imkafka,
    immark,
    imtcp_socket_source,
    parse_stream,
)
from rsyslog_spark.streaming.stateful import (
    streaming_dynstats,
    streaming_exact_dedup,
    streaming_ratelimit,
    streaming_repeated_msg_reduction,
    streaming_sendertrack,
)
from rsyslog_spark.streaming.sinks import (
    fanout_sink,
    omfile_sink,
    omkafka_sink,
    retrying_foreach_batch,
)
from rsyslog_spark.streaming.impstats import ImpstatsListener
from rsyslog_spark.streaming.transports import (
    amqp1_sink,
    omawslogs_sink,
    omazuredce_sink,
    omczmq_sink,
    omhttpfs_sink,
    omjournal_sink,
    omrabbitmq_sink,
    omrelp_sink,
    omhiredis_sink,
    ommail_sink,
    omotel_sink,
    omsnmp_sink,
    omstdout_sink,
    omuxsock_sink,
)
from rsyslog_spark.streaming.bridges import (
    imbatchreport,
    imbeats,
    imczmq,
    imdiag,
    imptcp,
    imrelp,
    imtcp,
    imdocker,
    imfifo,
    imhiredis,
    imhttp,
    imjournal,
    imklog,
    imkmsg,
    improg,
    imtuxedoulog,
    imudp,
    imuxsock,
)

__all__ = [
    "imfile", "imkafka", "immark", "imtcp", "imptcp", "imrelp",
    "imtcp_socket_source", "parse_stream",
    "imudp", "imuxsock", "imhttp", "imjournal", "imdocker",
    "imfifo", "imhiredis", "imklog", "imkmsg", "improg",
    "ommail_sink", "omsnmp_sink", "omhiredis_sink", "omotel_sink",
    "omuxsock_sink", "omstdout_sink", "amqp1_sink",
    "omjournal_sink", "omazuredce_sink", "omhttpfs_sink",
    "omrabbitmq_sink", "omawslogs_sink", "imbatchreport",
    "omrelp_sink", "imtuxedoulog", "imbeats", "imdiag", "imczmq",
    "omczmq_sink",
    "streaming_dynstats", "streaming_ratelimit", "streaming_exact_dedup",
    "streaming_repeated_msg_reduction", "streaming_sendertrack",
    "fanout_sink", "omfile_sink", "omkafka_sink",
    "retrying_foreach_batch", "ImpstatsListener",
]
