"""Streaming grouping of alignment records into record sets.

Four modes mirroring the reference generators (all group only CONSECUTIVE
runs of the same query identifier — interleaved queries form separate sets):

* unsorted, no split  (reference: alignmentrecord.hh:509-566): one set per
  consecutive query run.
* unsorted, split     (reference: alignmentrecord.hh:418-504): buffer the
  query run, sort by (query_start, query_stop, input order), emit one set per
  disjoint query interval — a split happens where start > running_stop.
* sorted, no split / sorted, split (reference: alignmentrecord.hh:570-631):
  streaming variants assuming pre-sorted input.

Masked ('*') records travel with their set; predictors skip them.
"""

from typing import Iterable, Iterator, List

from ..formats.alignments import AlignmentRecord


def iter_record_sets(
    records: Iterable[AlignmentRecord],
    split_alignments: bool = True,
    alignments_sorted: bool = False,
) -> Iterator[List[AlignmentRecord]]:
    if alignments_sorted:
        yield from _iter_sorted(records, split_alignments)
    else:
        yield from _iter_unsorted(records, split_alignments)


def _iter_query_runs(records) -> Iterator[List[AlignmentRecord]]:
    run: List[AlignmentRecord] = []
    last_qid = None
    for rec in records:
        if run and rec.query_identifier != last_qid:
            yield run
            run = []
        run.append(rec)
        last_qid = rec.query_identifier
    if run:
        yield run


def _iter_unsorted(records, split: bool) -> Iterator[List[AlignmentRecord]]:
    for run in _iter_query_runs(records):
        if not split:
            yield run
            continue
        # sort by (start, stop, input order); reference sorts tuples whose
        # third element is the record pointer (ties keep allocation order,
        # emulated here with the input index)
        ranges = sorted(
            range(len(run)),
            key=lambda k: (run[k].query_start, run[k].query_stop, k),
        )
        rset: List[AlignmentRecord] = []
        running_stop = None
        for k in ranges:
            rec = run[k]
            if running_stop is not None and rec.query_start > running_stop:
                yield rset
                rset = []
                running_stop = rec.query_stop
            else:
                running_stop = (
                    rec.query_stop
                    if running_stop is None
                    else max(running_stop, rec.query_stop)
                )
            rset.append(rec)
        if rset:
            yield rset


def _iter_sorted(records, split: bool) -> Iterator[List[AlignmentRecord]]:
    # streaming split on a pre-sorted stream (reference: :587-620)
    rset: List[AlignmentRecord] = []
    last_qid = None
    running_stop = None
    for rec in records:
        if rset and (
            rec.query_identifier != last_qid
            or (split and rec.query_start > running_stop)
        ):
            yield rset
            rset = []
            running_stop = None
        rset.append(rec)
        last_qid = rec.query_identifier
        running_stop = (
            rec.query_stop
            if running_stop is None
            else max(running_stop, rec.query_stop)
        )
    if rset:
        yield rset
