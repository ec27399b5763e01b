"""Lineage-cut staging shared by iterative operators.

Iterative driver-loop algorithms (the kc_toast bounded-pass resolver,
connected-components rounds, the ANN recall harness) must cut lineage
each pass — self-referencing plans otherwise blow up Catalyst analysis
time. ``localCheckpoint`` (executor memory/disk) is the zero-config
default; when the session has a RELIABLE checkpoint dir configured
(``sc.setCheckpointDir`` — an object-store path in a real deployment)
AND checkpoint garbage collection enabled
(``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — without it
every pass of every job would leak a checkpoint directory forever), the
reliable path is used instead: executor-memory staging of even tiny
state is the wrong durability class at 1000 executors, where an
executor loss mid-iteration would fail the whole job.
"""

from __future__ import annotations


def stage(df):
    """Materialize ``df`` with a lineage cut (see module docstring)."""
    sc = df.sparkSession.sparkContext
    if (
        sc._jsc.sc().checkpointDir().isDefined()
        and sc.getConf().get(
            "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
        ).lower() == "true"
    ):
        return df.checkpoint(eager=True)
    return df.localCheckpoint()
