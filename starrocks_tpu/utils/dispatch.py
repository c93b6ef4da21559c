"""Process-wide device dispatch fence.

ONE chip executes one XLA module at a time (the device serializes
executions), so serializing dispatch+readback host-side costs no
throughput — and it is required for safety: concurrent executions of
jitted modules from multiple Python threads reproducibly segfault
jaxlib's CPU client, which a threaded front door (service/mysql_server)
would otherwise hit. Admission control (Session._admit, workgroups)
bounds how many queries QUEUE at this fence; planning and host-side work
still overlap freely.

Reentrant: execution paths nest (execute_df -> execute -> to_pandas).
"""

import threading

EXEC_LOCK = threading.RLock()
