"""``awstape`` — Hercules AWS virtual-tape data source (RECFM=U / FB).

The reference engine (FixedLengthInputFormat.java:38-43) reads RECFM=F
data already deblocked into flat files.  Mainframe data that never got
deblocked ships as TAPE IMAGES, and the lingua franca for those is the
Hercules emulator's public AWSTAPE container: every physical tape block
is stored as one or more CHUNKS, each prefixed by a 6-byte
little-endian header::

    <HHBB  =  curblkl, prvblkl, flags1, flags2

``curblkl`` is this chunk's data length, ``prvblkl`` the previous
chunk's (0 at start of tape — the backspace chain), ``flags1`` is a bit
set: 0x80 NEWREC (chunk begins a block), 0x20 ENDREC (chunk ends it),
0x40 TAPEMARK (``curblkl`` = 0; the inter-file mark).  A block larger
than the writer's chunk cap spans several chunks (0x80, 0x00…, 0x20);
a single-chunk block carries 0xA0.  ``flags2`` is always zero.

This matters for RECFM=U ("undefined") datasets, where each physical
BLOCK *is* one logical record and there are no descriptor words at all:
a U record's boundary exists only on the device, so a flat-file dump
loses it — the tape image is the faithful transport.  (A BDW-framed
re-wrap of U would be byte-identical to RECFM=V, which sources/varlen.py
already reads; the tape container is the genuinely distinct on-disk
form.)

Engine contract mirrors ``varlen``:

  * ``recfm=U`` (default): block = record; ``layout``/``prefixLength``
    decode the fixed prefix, the remainder lands in ``record_tail``,
    ``record_offset`` is the byte position of the record's first chunk
    header in the image.
  * ``recfm=F``/``FB``: ``recordLength`` records tile every block (a
    non-multiple block raises, the reference's planning-time error
    carried to tape); the full layout decodes like ``fixedlen`` and
    ``record_offset`` is the record's position in the DEBLOCKED byte
    stream (rank * recordLength) — the offset the reference would have
    assigned after deblocking.
  * tape marks are file separators: ``tape_file`` (0-based) is emitted
    when ``includeFile=true``; two consecutive marks end the tape.

Splitting: chunk headers chain (no magic, no index), so an image is one
partition — parallelism comes from many images, the standard unload
shape.  Our writer emits one ``.aws`` image per input partition and
terminates each with tapemark + end-of-tape mark.

IBM STANDARD LABELS (``labels=sl``): real volumes carry an EBCDIC
VOL1+HDR1+HDR2 header group (tape file 0), the data file, and an
EOF1+EOF2 trailer — all 80-byte tape blocks through the same chunk
machinery.  The reader validates every field it understands (magics,
HDR1/EOF1 dataset name vs the ``dataset`` option, HDR2 recfm/lrecl vs
its own configuration, EOF1 block count vs the walk) BEFORE data
flows; the writer emits a complete labeled volume per partition.

Corruption policy (the reference's fail-fast stance, FLRR:199-260):
a nonzero ``flags2``, an unknown ``flags1`` combination, a broken
``prvblkl`` chain, a continuation chunk without an open block, or EOF
mid-chunk all raise with the image offset.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from dataclasses import dataclass
from typing import Iterator

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from hadoop_fixedlengthinputformat_spark.sources.fixedlen import _visible
from hadoop_fixedlengthinputformat_spark.sources.layout import (
    FieldSpec,
    decode_chunk,
    encode_rows,
    layout_schema,
    parse_layout,
)

HDR_LEN = 6
_F1_NEWREC = 0x80
_F1_ENDREC = 0x20
_F1_TAPEMARK = 0x40
_MAX_CHUNK = 0xFFFF


@dataclass
class _TOptions:
    recfm: str  # "U" | "F" (FB treated identically)
    record_length: int  # F mode only
    prefix_length: int  # U mode fixed-prefix data bytes (0 = raw)
    fields: list[FieldSpec] | None
    with_offset: bool
    with_file: bool
    with_tail: bool
    tail_column: str
    encoding: str
    chunk_size: int  # writer data bytes per chunk
    block_size: int  # F-mode writer block bytes (multiple of record_length)
    labels: str = "NONE"  # "NONE" | "SL" (IBM standard labels)
    dataset: str | None = None  # SL: required HDR1/EOF1 dataset name
    file_seq: int | None = None  # SL: 1-based dataset position on volume
    volser: str = "SPARK1"  # SL writer volume serial
    label_encoding: str = "cp037"  # SL labels are EBCDIC on real volumes

    @classmethod
    def parse(cls, options) -> "_TOptions":
        options = dict(options.items()) if hasattr(options, "items") else dict(options)
        recfm = options.get("recfm", "u").upper()
        if recfm == "FB":
            recfm = "F"
        if recfm not in ("U", "F"):
            raise ValueError(
                f"awstape: recfm must be U, F or FB, got {recfm!r}"
            )
        layout_raw = options.get("layout")
        fields = None
        record_length = 0
        prefix_length = 0
        if recfm == "F":
            rl_raw = options.get("recordlength")
            if rl_raw is None:
                raise ValueError(
                    "awstape: option 'recordLength' is required with recfm=F"
                )
            try:
                record_length = int(rl_raw)
            except ValueError:
                raise ValueError(
                    f"awstape: recordLength must be an integer, got {rl_raw!r}"
                )
            if record_length <= 0:
                raise ValueError(
                    f"awstape: recordLength must be > 0, got {record_length}"
                )
            if options.get("prefixlength") is not None:
                raise ValueError(
                    "awstape: 'prefixLength' applies to recfm=U only "
                    "(F records are whole-layout, there is no tail)"
                )
            if layout_raw is None:
                raise ValueError(
                    "awstape: option 'layout' is required with recfm=F"
                )
            fields = parse_layout(layout_raw, record_length)
        else:
            pl_raw = options.get("prefixlength")
            if layout_raw is not None:
                if pl_raw is None:
                    raise ValueError(
                        "awstape: option 'prefixLength' is required with "
                        "'layout' (the fixed data bytes every record carries)"
                    )
                prefix_length = int(pl_raw)
                if prefix_length <= 0:
                    raise ValueError(
                        f"awstape: prefixLength must be > 0, got {prefix_length}"
                    )
                fields = parse_layout(layout_raw, prefix_length)
            elif pl_raw is not None:
                raise ValueError(
                    "awstape: option 'prefixLength' requires 'layout' (raw "
                    "mode emits the whole block as 'value')"
                )
            if options.get("recordlength") is not None:
                raise ValueError(
                    "awstape: 'recordLength' applies to recfm=F only (U "
                    "records are whole blocks of undefined length)"
                )
        with_offset = options.get("includeoffset", "true").lower() == "true"
        with_file = options.get("includefile", "false").lower() == "true"
        with_tail = options.get("includetail", "true").lower() == "true"
        tail_column = options.get("tailcolumn", "record_tail")
        if fields is not None and tail_column in {f.name for f in fields}:
            raise ValueError(
                f"awstape: tailColumn {tail_column!r} clashes with a layout field"
            )
        import codecs

        enc_raw = options.get("encoding", "utf-8")
        try:
            info = codecs.lookup(enc_raw)
            probe = "0A ".encode(info.name)
        except LookupError:
            raise ValueError(f"awstape: unknown encoding {enc_raw!r}")
        if len(probe) != 3:
            raise ValueError(
                f"awstape: encoding {enc_raw!r} is not a single-byte charset"
            )
        chunk_size = int(options.get("chunksize", "4096"))
        if not (1 <= chunk_size <= _MAX_CHUNK):
            raise ValueError(
                f"awstape: chunkSize must be in 1..{_MAX_CHUNK}, got {chunk_size}"
            )
        block_size = int(options.get("blocksize", "0"))
        if recfm == "F":
            if block_size == 0:
                block_size = record_length * max(1, 32760 // record_length)
            if block_size % record_length != 0 or block_size <= 0:
                raise ValueError(
                    f"awstape: blockSize {block_size} must be a positive "
                    f"multiple of recordLength {record_length} (FB blocks "
                    "hold whole records; the reference raises on non-"
                    "multiples, FixedLengthInputFormat.java:344-361)"
                )
        labels = options.get("labels", "none").upper()
        if labels not in ("NONE", "SL"):
            raise ValueError(
                f"awstape: labels must be NONE or SL, got {labels!r}"
            )
        dataset = options.get("dataset")
        if dataset is not None:
            dataset = dataset.upper()
            if not (1 <= len(dataset) <= 17):
                raise ValueError(
                    f"awstape: dataset name must be 1..17 characters "
                    f"(HDR1 field width), got {dataset!r}"
                )
        file_seq = None
        if options.get("fileseq") is not None:
            file_seq = int(options["fileseq"])
            if file_seq < 1:
                raise ValueError(
                    f"awstape: fileSeq is 1-based, got {file_seq}"
                )
            if labels != "SL":
                raise ValueError(
                    "awstape: fileSeq selects a dataset on an SL volume "
                    "(labels=sl)"
                )
        volser = options.get("volser", "SPARK1").upper()
        if not (1 <= len(volser) <= 6):
            raise ValueError(
                f"awstape: volser must be 1..6 characters, got {volser!r}"
            )
        label_encoding = options.get("labelencoding", "cp037")
        try:
            codecs.lookup(label_encoding)
        except LookupError:
            raise ValueError(
                f"awstape: unknown labelEncoding {label_encoding!r}"
            )
        return cls(
            recfm, record_length, prefix_length, fields, with_offset,
            with_file, with_tail, tail_column, info.name, chunk_size,
            block_size, labels, dataset, file_seq, volser, label_encoding,
        )

    def spark_schema(self) -> StructType:
        out: list[StructField] = []
        if self.with_file:
            out.append(StructField("tape_file", IntegerType(), False))
        if self.with_offset:
            out.append(StructField("record_offset", LongType(), False))
        if self.fields is None:
            out.append(StructField("value", BinaryType(), False))
        else:
            out.extend(layout_schema(self.fields).fields)
            if self.recfm == "U" and self.with_tail:
                out.append(StructField(self.tail_column, BinaryType(), False))
        return StructType(out)

    def layout_arrow_schema(self) -> pa.Schema:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(layout_schema(self.fields))

    def arrow_schema(self) -> pa.Schema:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self.spark_schema())


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(filter(_visible, _glob.glob(os.path.join(path, "*"))))
    elif os.path.isfile(path):
        return [path]
    names = sorted(filter(_visible, _glob.glob(path)))
    if not names:
        raise FileNotFoundError(f"awstape: no input files at {path!r}")
    return names


def iter_blocks(
    fobj,
    path: str,
    eot_on_double_mark: bool = True,
    start: tuple[int, int, int, bool] | None = None,
    stop_on_partial: bool = False,
    end_pos: int | None = None,
) -> Iterator[tuple[int, int, bytes, tuple[int, int, int, bool]]]:
    """Walk an AWS image; yield ``(tape_file, block_offset, block bytes,
    resume_state)`` for every data block (chunks assembled), where
    ``resume_state = (pos, prev_len, tape_file, last_was_mark)`` is the
    walk state right after the block's ENDREC chunk — the only safe
    re-entry points for a tailing stream (resuming mid-chain would
    orphan continuation chunks, and the backspace-chain check needs the
    previous chunk length).  ``start`` resumes from such a state.
    Tape marks advance ``tape_file``; two consecutive marks
    (end-of-tape) or EOF stop the walk — except under SL labels
    (``eot_on_double_mark=False``), where an empty dataset legitimately
    carries consecutive marks and only physical EOF ends it.
    ``stop_on_partial`` turns EOF-truncation (mid-header, mid-chunk, or
    chain-open) into a clean stop — the tailing case, where a
    half-written chunk chain is growth in flight, not corruption.
    Every header rule is enforced (module docstring)."""
    pos, prev_len, tape_file, last_was_mark = start or (0, 0, 0, False)
    open_parts: list[bytes] | None = None
    open_off = 0
    while True:
        # ``end_pos`` is always a block boundary (a replay bound from a
        # prior resume state) — stop BEFORE touching bytes past it, so
        # an in-flight partial chain beyond the committed range can
        # never disturb an exact replay
        if end_pos is not None and pos >= end_pos:
            return
        hdr = fobj.read(HDR_LEN)
        if not hdr:
            if open_parts is not None:
                if stop_on_partial:
                    return
                raise IOError(
                    f"awstape: {path!r} ends mid-block (chunk chain open "
                    f"since offset {open_off}, no ENDREC)"
                )
            return
        if len(hdr) < HDR_LEN:
            if stop_on_partial:
                return
            raise IOError(
                f"awstape: {path!r} ends mid-header at offset {pos} "
                f"({len(hdr)} trailing bytes)"
            )
        curblkl, prvblkl, flags1, flags2 = struct.unpack("<HHBB", hdr)
        if flags2 != 0:
            raise ValueError(
                f"awstape: nonzero flags2 byte at offset {pos} in {path!r}"
            )
        if prvblkl != prev_len:
            raise ValueError(
                f"awstape: broken backspace chain at offset {pos} in "
                f"{path!r} (header says previous chunk was {prvblkl} "
                f"bytes, walk saw {prev_len})"
            )
        if flags1 == _F1_TAPEMARK:
            if curblkl != 0:
                raise ValueError(
                    f"awstape: tapemark with nonzero length {curblkl} at "
                    f"offset {pos} in {path!r}"
                )
            if open_parts is not None:
                raise ValueError(
                    f"awstape: tapemark at offset {pos} in {path!r} inside "
                    f"the block open since offset {open_off}"
                )
            if last_was_mark and eot_on_double_mark:
                return  # end-of-tape convention: two consecutive marks
            last_was_mark = True
            tape_file += 1
            prev_len = 0
            pos += HDR_LEN
            continue
        # middle chunks of a spanning block carry flags1 = 0x00
        known = _F1_NEWREC | _F1_ENDREC
        if flags1 & ~known:
            raise ValueError(
                f"awstape: unknown flags1 0x{flags1:02x} at offset {pos} "
                f"in {path!r}"
            )
        if curblkl == 0:
            raise ValueError(
                f"awstape: zero-length data chunk at offset {pos} in {path!r}"
            )
        data = fobj.read(curblkl)
        if len(data) < curblkl:
            if stop_on_partial:
                return
            raise IOError(
                f"awstape: {path!r} ends mid-chunk at offset {pos} (header "
                f"claims {curblkl} data bytes, {len(data)} available)"
            )
        last_was_mark = False
        if flags1 & _F1_NEWREC:
            if open_parts is not None:
                raise ValueError(
                    f"awstape: NEWREC chunk at offset {pos} in {path!r} "
                    f"while the block at offset {open_off} is still open"
                )
            open_parts, open_off = [data], pos
        else:
            if open_parts is None:
                raise ValueError(
                    f"awstape: continuation chunk at offset {pos} in "
                    f"{path!r} with no block open"
                )
            open_parts.append(data)
        if flags1 & _F1_ENDREC:
            yield tape_file, open_off, b"".join(open_parts), (
                pos + HDR_LEN + curblkl, curblkl, tape_file, False,
            )
            open_parts = None
        prev_len = curblkl
        pos += HDR_LEN + curblkl


_LABEL_LEN = 80


def _label(kind: str, body: str, enc: str) -> bytes:
    """An 80-byte label block: 4-char magic + body, space-padded."""
    s = (kind + body)[:_LABEL_LEN].ljust(_LABEL_LEN)
    return s.encode(enc)


def _hdr1_body(dsname: str, blocks: int | None) -> str:
    """HDR1/EOF1 body: dataset name at bytes 4-20, block count (EOF1)
    at bytes 54-59 — the two fields this engine reads back."""
    body = dsname.ljust(17)  # bytes 4-20
    body = body.ljust(50)  # up to byte 53
    body += f"{blocks:06d}" if blocks is not None else "000000"
    return body


def _hdr2_body(recfm: str, blksize: int, lrecl: int) -> str:
    """HDR2/EOF2 body: recfm char at byte 4, block length 5-9, record
    length 10-14."""
    return f"{recfm}{min(blksize, 99999):05d}{min(lrecl, 99999):05d}"


def iter_labeled_blocks(
    fobj, path: str, opts: _TOptions
) -> Iterator[tuple[int, int, bytes, tuple[int, int, int, bool]]]:
    """IBM standard-label (SL) walk over a (possibly multi-dataset)
    volume.  Dataset k occupies three tape files: header group at
    ``3k`` (VOL1 leads only the first), data at ``3k+1``, EOF1+EOF2
    trailer at ``3k+2`` — the arithmetic holds even for EMPTY datasets,
    whose data file contributes no blocks but still consumes a tape
    file between its marks.  The ``dataset`` option selects by HDR1
    name, ``fileSeq`` by 1-based position (both given must agree);
    default is the first dataset.

    Every label field this engine understands is VALIDATED, not
    skipped: magics and EOF1 name/block-count for EVERY dataset on the
    volume (a torn tape shows as a count shortfall even when every
    surviving block parses), plus HDR2 recfm/lrecl against the
    reader's own options for the SELECTED dataset (other datasets on
    the volume may legitimately carry different record formats) —
    catching the mount-the-wrong-tape and read-U-as-F operational
    errors before any data flows."""
    enc = opts.label_encoding
    headers: dict[int, list[tuple[int, bytes]]] = {}
    trailers: dict[int, list[tuple[int, bytes]]] = {}
    n_data: dict[int, int] = {}
    names: dict[int, str] = {}
    selected: int | None = None
    validated = False

    def decode(off: int, b: bytes) -> str:
        if len(b) != _LABEL_LEN:
            raise ValueError(
                f"awstape: label block at offset {off} in {path!r} is "
                f"{len(b)} bytes (standard labels are {_LABEL_LEN})"
            )
        return b.decode(enc)

    def expect(lbl: str, kind: str, off: int) -> str:
        if lbl[:4] != kind:
            raise ValueError(
                f"awstape: expected {kind} label at offset {off} in "
                f"{path!r}, found {lbl[:4]!r}"
            )
        return lbl

    def header_name(ds: int) -> str:
        """Validate dataset ``ds``'s header group magics; return its
        HDR1 name (memoized)."""
        if ds in names:
            return names[ds]
        grp = headers.get(ds, [])
        want = 3 if ds == 0 else 2  # VOL1 leads only the first group
        if len(grp) != want:
            raise ValueError(
                f"awstape: SL header group {ds} in {path!r} has "
                f"{len(grp)} label blocks, expected "
                + ("VOL1+HDR1+HDR2" if ds == 0 else "HDR1+HDR2")
            )
        i = 0
        if ds == 0:
            expect(decode(*grp[0]), "VOL1", grp[0][0])
            i = 1
        hdr1 = expect(decode(*grp[i]), "HDR1", grp[i][0])
        expect(decode(*grp[i + 1]), "HDR2", grp[i + 1][0])
        names[ds] = hdr1[4:21].strip()
        return names[ds]

    def hdr2_of(ds: int) -> str:
        grp = headers[ds]
        return decode(*grp[2 if ds == 0 else 1])

    def choose(ds: int) -> bool:
        """Is dataset ``ds`` the one the reader asked for?"""
        name = header_name(ds)
        by_name = opts.dataset is not None and name == opts.dataset
        by_seq = opts.file_seq is not None and ds == opts.file_seq - 1
        if opts.dataset is not None and opts.file_seq is not None:
            if by_seq and not by_name:
                raise ValueError(
                    f"awstape: fileSeq {opts.file_seq} in {path!r} holds "
                    f"dataset {name!r}, not the requested "
                    f"{opts.dataset!r}"
                )
            return by_seq and by_name
        if opts.dataset is not None:
            return by_name
        if opts.file_seq is not None:
            return by_seq
        return ds == 0

    def check_selected(ds: int) -> None:
        """recfm/lrecl validation for the dataset actually read."""
        nonlocal validated
        hdr2 = hdr2_of(ds)
        lbl_recfm = hdr2[4]
        if lbl_recfm != opts.recfm:
            raise ValueError(
                f"awstape: HDR2 says recfm={lbl_recfm!r} but the reader "
                f"is configured for {opts.recfm!r} in {path!r}"
            )
        if opts.recfm == "F":
            lrecl = int(hdr2[10:15])
            if lrecl != opts.record_length:
                raise ValueError(
                    f"awstape: HDR2 record length {lrecl} != configured "
                    f"recordLength {opts.record_length} in {path!r}"
                )
        validated = True

    # the closing TM TM is structure here, not end-of-tape: an EMPTY
    # dataset legitimately puts two consecutive marks between HDR and
    # EOF groups, so the walk runs to physical EOF instead
    for tf, off, block, resume in iter_blocks(
        fobj, path, eot_on_double_mark=False
    ):
        ds, phase = divmod(tf, 3)
        if phase == 0:
            headers.setdefault(ds, []).append((off, block))
        elif phase == 1:
            if selected is None and choose(ds):
                selected = ds
                check_selected(ds)  # validate BEFORE any data flows
            n_data[ds] = n_data.get(ds, 0) + 1
            if ds == selected:
                yield tf, off, block, resume
        else:
            trailers.setdefault(ds, []).append((off, block))
    # post-walk: every dataset's labels + counts validate; the
    # requested dataset must exist
    for ds in sorted(headers):
        dsname = header_name(ds)
        grp = trailers.get(ds, [])
        if len(grp) != 2:
            raise ValueError(
                f"awstape: SL trailer group {ds} in {path!r} has "
                f"{len(grp)} label blocks, expected EOF1+EOF2"
            )
        eof1 = expect(decode(*grp[0]), "EOF1", grp[0][0])
        expect(decode(*grp[1]), "EOF2", grp[1][0])
        if eof1[4:21].strip() != dsname:
            raise ValueError(
                f"awstape: EOF1 dataset {eof1[4:21].strip()!r} != HDR1 "
                f"dataset {dsname!r} in {path!r}"
            )
        count = int(eof1[54:60])
        if count != n_data.get(ds, 0):
            raise ValueError(
                f"awstape: EOF1 block count {count} != "
                f"{n_data.get(ds, 0)} data blocks walked for dataset "
                f"{dsname!r} in {path!r} (torn tape?)"
            )
        if selected is None and choose(ds):
            selected = ds  # empty selected dataset: still validate
            check_selected(ds)
    if not headers:
        raise ValueError(
            f"awstape: no SL label groups found in {path!r} (unlabeled "
            "tape read with labels=sl?)"
        )
    if selected is None or not validated:
        want = (
            f"dataset {opts.dataset!r}" if opts.dataset is not None
            else f"fileSeq {opts.file_seq}" if opts.file_seq is not None
            else "the first dataset"
        )
        raise ValueError(
            f"awstape: {path!r} does not hold {want} "
            f"(cataloged: {[names[d] for d in sorted(names)]})"
        )


class TapePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AwsTapeReader(DataSourceReader):
    """One partition per image (chunk headers chain — no random entry);
    fleets of images parallelize across tasks."""

    BATCH_TARGET = 1 << 22

    def __init__(self, opts: _TOptions, path: str):
        self.opts = opts
        self.path = path

    def partitions(self):
        files = _list_files(self.path)
        return [TapePartition(p) for p in files] or [TapePartition("")]

    def read(self, partition: TapePartition):
        o = self.opts
        if not partition.path:
            return iter(())

        full_schema = o.arrow_schema()
        layout_arrow = o.layout_arrow_schema() if o.fields is not None else None

        def build_batch(
            files: list[int], offsets: list[int], fixed: bytearray,
            tails: list[bytes], rl: int,
        ) -> pa.RecordBatch:
            cols: list[pa.Array] = []
            if o.with_file:
                cols.append(pa.array(files, type=pa.int32()))
            if o.with_offset:
                cols.append(pa.array(offsets, type=pa.int64()))
            if o.fields is None:
                cols.append(pa.array(tails, type=pa.binary()))
            else:
                layout_batch = decode_chunk(
                    bytes(fixed), rl, o.fields, 0, False, None,
                    layout_arrow, encoding=o.encoding,
                )
                cols.extend(layout_batch.columns)
                if o.recfm == "U" and o.with_tail:
                    cols.append(pa.array(tails, type=pa.binary()))
            return pa.RecordBatch.from_arrays(cols, schema=full_schema)

        def gen():
            rl = o.record_length if o.recfm == "F" else o.prefix_length
            files: list[int] = []
            offsets: list[int] = []
            fixed = bytearray()
            tails: list[bytes] = []
            pending = 0
            data_pos = 0  # F mode: deblocked byte offset
            with open(partition.path, "rb") as f:
                walk = (
                    iter_labeled_blocks(f, partition.path, o)
                    if o.labels == "SL"
                    else iter_blocks(f, partition.path)
                )
                for tf, boff, block, _resume in walk:
                    if o.recfm == "F":
                        if len(block) % o.record_length != 0:
                            raise ValueError(
                                f"awstape: block at offset {boff} in "
                                f"{partition.path!r} is {len(block)} bytes, "
                                f"not a multiple of recordLength "
                                f"{o.record_length}"
                            )
                        nrec = len(block) // o.record_length
                        files.extend([tf] * nrec)
                        offsets.extend(
                            data_pos + i * o.record_length for i in range(nrec)
                        )
                        fixed.extend(block)
                        data_pos += len(block)
                    else:
                        if len(block) < o.prefix_length:
                            raise ValueError(
                                f"awstape: block at offset {boff} in "
                                f"{partition.path!r} is {len(block)} bytes, "
                                f"shorter than the declared prefix "
                                f"({o.prefix_length})"
                            )
                        files.append(tf)
                        offsets.append(boff)
                        if o.fields is None:
                            tails.append(block)
                        else:
                            fixed.extend(block[: o.prefix_length])
                            tails.append(block[o.prefix_length :])
                    pending += len(block)
                    if pending >= self.BATCH_TARGET:
                        yield build_batch(files, offsets, fixed, tails, rl)
                        files, offsets, fixed, tails = [], [], bytearray(), []
                        pending = 0
            if offsets:
                yield build_batch(files, offsets, fixed, tails, rl)

        return gen()


class AwsTapeStreamReader(SimpleDataSourceStreamReader):
    """Tail ONE growing AWS image (recfm=U, unlabeled).  An offset is
    the full walk state ``(pos, prev, tf, mark)`` — the byte position
    of the next unread chunk header plus the backspace-chain value and
    tape-file counters needed to re-enter there, so restart replays
    re-validate the exact chain they first walked.  Only WHOLE blocks
    are admitted: a half-written chunk chain at EOF is growth in
    flight and its entire chain stays unread until the ENDREC chunk
    lands (the whole-record invariant carried to chunked tape blocks).
    A closed tape (double mark) simply stops yielding new rows."""

    BATCH_TARGET = 1 << 22

    def __init__(self, opts: _TOptions, path: str):
        self.opts = opts
        self.path = path

    def initialOffset(self):
        return {"pos": 0, "prev": 0, "tf": 0, "mark": False}

    def _rows(self, lo: dict, hi: dict | None, stop_on_partial: bool,
              max_bytes: int | None = None):
        o = self.opts
        if not os.path.exists(self.path):
            return [], lo
        recs: list[tuple[int, int, bytes]] = []
        end = lo
        with open(self.path, "rb") as f:
            f.seek(lo["pos"])
            for tf, off, block, resume in iter_blocks(
                f, self.path,
                start=(lo["pos"], lo["prev"], lo["tf"], lo["mark"]),
                stop_on_partial=stop_on_partial,
                end_pos=hi["pos"] if hi is not None else None,
            ):
                if len(block) < o.prefix_length:
                    raise ValueError(
                        f"awstape: block at offset {off} in {self.path!r} "
                        f"is {len(block)} bytes, shorter than the declared "
                        f"prefix ({o.prefix_length})"
                    )
                recs.append((tf, off, block))
                end = {
                    "pos": resume[0], "prev": resume[1],
                    "tf": resume[2], "mark": resume[3],
                }
                if max_bytes is not None and resume[0] - lo["pos"] >= max_bytes:
                    break
        if not recs:
            return [], lo
        offsets = [off for _tf, off, _ in recs]
        prefixes = bytearray()
        tails: list[bytes] = []
        for _tf, _off, block in recs:
            if o.fields is None:
                tails.append(block)
            else:
                prefixes.extend(block[: o.prefix_length])
                tails.append(block[o.prefix_length :])
        cols: list[pa.Array] = []
        if o.with_file:
            cols.append(
                pa.array([tf for tf, _off, _b in recs], type=pa.int32())
            )
        if o.with_offset:
            cols.append(pa.array(offsets, type=pa.int64()))
        if o.fields is None:
            cols.append(pa.array(tails, type=pa.binary()))
        else:
            layout_batch = decode_chunk(
                bytes(prefixes), o.prefix_length, o.fields, 0, False, None,
                o.layout_arrow_schema(), encoding=o.encoding,
            )
            cols.extend(layout_batch.columns)
            if o.with_tail:
                cols.append(pa.array(tails, type=pa.binary()))
        batch = pa.RecordBatch.from_arrays(cols, schema=o.arrow_schema())
        return [tuple(r.values()) for r in batch.to_pylist()], end

    def read(self, start: dict):
        # cap the per-batch span so a large backlog drains across
        # micro-batches instead of materializing at once (ADVICE r3)
        rows, pos = self._rows(
            start, None, stop_on_partial=True, max_bytes=self.BATCH_TARGET
        )
        return iter(rows), pos

    def readBetweenOffsets(self, start: dict, end: dict):
        if end["pos"] <= start["pos"]:
            return iter(())
        rows, _pos = self._rows(start, end, stop_on_partial=False)
        return iter(rows)

    def commit(self, end: dict):
        pass


class _TCommitMessage(WriterCommitMessage):
    def __init__(self, outputs: list[tuple[str, str]], n_records: int):
        self.outputs = outputs
        self.n_records = n_records


class AwsTapeWriter(DataSourceWriter):
    """One ``.aws`` image per input partition, each a complete tape:
    data blocks, tapemark, end-of-tape tapemark.

    ``stream_mode`` (set by :class:`AwsTapeStreamWriter`) defers final
    naming to commit time: parts encode into hidden attempt-unique
    tmps and the commit message carries the partition id so the
    streaming sink can promote them to batch-id-keyed names."""

    stream_mode = False

    def __init__(self, opts: _TOptions, path: str, overwrite: bool):
        self.opts = opts
        self.path = path
        self.overwrite = overwrite
        import uuid

        self.token = uuid.uuid4().hex[:10]

    def write(self, iterator) -> _TCommitMessage:
        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        ctx = TaskContext.get()
        o = self.opts
        if self.stream_mode:
            final = None
            tmp = os.path.join(
                self.path,
                f".tmp-stream-{self.token}-{ctx.taskAttemptId()}",
            )
        else:
            final = os.path.join(
                self.path, f"part-{ctx.partitionId():05d}-{self.token}.aws"
            )
            tmp = f"{final}.tmp-{ctx.taskAttemptId()}"
        n = 0
        n_blocks = 0
        prev_len = 0
        out: list[bytes] = []

        def emit_block(block: bytes) -> None:
            nonlocal prev_len, n_blocks
            n_blocks += 1
            view = memoryview(block)
            first = True
            while True:
                take = min(len(view), o.chunk_size)
                chunk = bytes(view[:take])
                view = view[take:]
                last = len(view) == 0
                flags1 = (_F1_NEWREC if first else 0) | (
                    _F1_ENDREC if last else 0
                )
                out.append(
                    struct.pack("<HHBB", len(chunk), prev_len, flags1, 0)
                )
                out.append(chunk)
                prev_len = len(chunk)
                first = False
                if last:
                    break

        def payload_bytes(row) -> bytes:
            if o.fields is None:
                return bytes(row["value"])
            d = row.asDict()
            if o.recfm == "F":
                return encode_rows(
                    [d], o.fields, o.record_length, encoding=o.encoding
                )
            tail = d.get(o.tail_column) if o.with_tail else b""
            if tail is None:
                tail = b""
            elif isinstance(tail, str):
                tail = tail.encode("utf-8")
            else:
                tail = bytes(tail)
            return (
                encode_rows([d], o.fields, o.prefix_length, encoding=o.encoding)
                + tail
            )

        def tapemark() -> None:
            nonlocal prev_len
            out.append(struct.pack("<HHBB", 0, prev_len, _F1_TAPEMARK, 0))
            prev_len = 0

        dsname = (
            o.dataset or os.path.basename(self.path).upper()[:17]
            or "SPARK.DATA"
        )
        if o.labels == "SL":
            lrecl = o.record_length if o.recfm == "F" else 0
            blksize = o.block_size if o.recfm == "F" else o.chunk_size
            emit_block(_label("VOL1", o.volser, o.label_encoding))
            emit_block(
                _label("HDR1", _hdr1_body(dsname, None), o.label_encoding)
            )
            emit_block(
                _label(
                    "HDR2", _hdr2_body(o.recfm, blksize, lrecl),
                    o.label_encoding,
                )
            )
            tapemark()
            n_blocks = 0  # EOF1 counts DATA blocks only

        block = bytearray()
        for row in iterator:
            payload = payload_bytes(row)
            if o.recfm == "F":
                block.extend(payload)
                if len(block) >= o.block_size:
                    emit_block(bytes(block[: o.block_size]))
                    del block[: o.block_size]
            else:
                if not payload:
                    raise ValueError(
                        "awstape: a RECFM=U record must have at least one "
                        "byte (an empty block is indistinguishable from a "
                        "tapemark)"
                    )
                emit_block(payload)
            n += 1
        if block:
            emit_block(bytes(block))
        if o.labels == "SL":
            if n_blocks > 999999:
                raise ValueError(
                    f"awstape: {n_blocks} data blocks exceeds the 6-digit "
                    "EOF1 block-count field; split the write"
                )
            data_blocks = n_blocks
            lrecl = o.record_length if o.recfm == "F" else 0
            blksize = o.block_size if o.recfm == "F" else o.chunk_size
            tapemark()
            emit_block(
                _label(
                    "EOF1", _hdr1_body(dsname, data_blocks), o.label_encoding
                )
            )
            emit_block(
                _label(
                    "EOF2", _hdr2_body(o.recfm, blksize, lrecl),
                    o.label_encoding,
                )
            )
        # tapemark after the file + end-of-tape mark
        tapemark()
        tapemark()
        with open(tmp, "wb") as f:
            f.write(b"".join(out))
        msg = _TCommitMessage([(tmp, final)], n)
        msg.partition_id = ctx.partitionId()
        return msg

    def commit(self, messages):
        if self.overwrite and os.path.isdir(self.path):
            for fn in os.listdir(self.path):
                if (
                    fn.startswith("part-")
                    and fn.endswith(".aws")
                    and f"-{self.token}." not in fn
                ):
                    os.remove(os.path.join(self.path, fn))
        for m in messages:
            if m is not None:
                for tmp, final in m.outputs:
                    os.replace(tmp, final)

    def abort(self, messages):
        for m in messages:
            if m is not None:
                for tmp, _final in m.outputs:
                    if os.path.exists(tmp):
                        os.remove(tmp)


class AwsTapeStreamWriter(DataSourceStreamWriter):
    """Streaming AWS-tape SINK, completing the tape source matrix
    (batch read/write + stream read already exist) and mirroring
    ``FixedLengthStreamWriter``'s idempotent-replay contract: each
    micro-batch partition encodes a complete tape image (data blocks,
    labels if requested, tapemarks) into a hidden attempt-unique tmp
    via the batch writer in ``stream_mode``; ``commit(messages,
    batchId)`` promotes them to BATCH-ID-KEYED final names
    (``batch-{id}-part-{p}.aws``), so a replayed micro-batch after a
    crash overwrites its own images instead of duplicating records —
    exactly-once on top of the checkpoint's batch-id replay."""

    def __init__(self, opts: _TOptions, path: str):
        self._inner = AwsTapeWriter(opts, path, overwrite=False)
        self._inner.stream_mode = True
        self.path = path

    def write(self, iterator) -> _TCommitMessage:
        return self._inner.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, _final in m.outputs:
                final = os.path.join(
                    self.path,
                    f"batch-{batchId:08d}-part-{m.partition_id:05d}.aws",
                )
                os.replace(tmp, final)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for tmp, _final in m.outputs:
                if os.path.exists(tmp):
                    os.remove(tmp)


class AwsTapeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "awstape"

    def __init__(self, options):
        super().__init__(options)
        self.opts = _TOptions.parse(options)
        self.path = options.get("path")
        if not self.path:
            raise ValueError("awstape: a path is required (.load(path))")

    def schema(self) -> StructType:
        return self.opts.spark_schema()

    def reader(self, schema: StructType) -> AwsTapeReader:
        return AwsTapeReader(self.opts, self.path)

    def writer(self, schema: StructType, overwrite: bool) -> AwsTapeWriter:
        return AwsTapeWriter(self.opts, self.path, overwrite)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> AwsTapeStreamWriter:
        return AwsTapeStreamWriter(self.opts, self.path)

    def simpleStreamReader(self, schema: StructType) -> AwsTapeStreamReader:
        if os.path.isdir(self.path):
            raise ValueError("awstape streaming tails a single image file")
        if self.opts.labels != "NONE":
            raise ValueError(
                "awstape streaming reads unlabeled images (the SL trailer "
                "is written after the data a tail is still following)"
            )
        if self.opts.recfm != "U":
            raise ValueError(
                "awstape streaming supports recfm=U (deblocked F offsets "
                "are not stable across growing batches)"
            )
        return AwsTapeStreamReader(self.opts, self.path)


def register(spark) -> None:
    """Idempotent per-session registration."""
    if getattr(spark, "_awstape_registered", False):
        return
    spark.dataSource.register(AwsTapeDataSource)
    spark._awstape_registered = True
