"""Snapshot-versioned table catalog: the Iceberg metadata layer, shaped.

``Catalog`` (catalog.py) maps each table to one mutable directory and
needs a scratch-write + atomic-rename swap to survive read-your-own-
target MERGEs. This module implements the thing Iceberg actually does
instead: **immutable data files + a tiny versioned metadata log**, which
buys snapshot isolation, time travel, rollback and safe concurrent
readers with no swap tricks at all.

On-disk layout per table (all under the catalog base dir)::

    <name>/metadata/v<N>.json        one manifest per snapshot (append-only)
    <name>/metadata/version-hint.text  current snapshot pointer (atomic rename)
    <name>/data/<commit-uuid>/part-*.parquet   immutable data dirs

A manifest lists the *data directories* visible in that snapshot —
Iceberg tracks individual files through manifest lists; directory
granularity is the sandbox simplification (each commit's files land in
exactly one fresh directory, so dir == file-set) and the protocol is
otherwise the same:

- **commit** = write data to a brand-new directory nobody references,
  write manifest ``v<N+1>.json``, then atomically repoint
  ``version-hint.text`` (tmp file + ``os.rename``). A reader that
  resolved the hint a microsecond earlier keeps planning against the old
  manifest's files, which are immutable — snapshot isolation without
  locks. On a real object store the rename becomes the Iceberg catalog's
  compare-and-swap on the metadata pointer.
- **append** = new snapshot referencing parent dirs + the new dir.
- **overwrite / merge** = new snapshot referencing only the new dir(s);
  the old data stays on disk, reachable by time travel, until
  ``expire_snapshots`` garbage-collects it.
- **rollback** = a NEW snapshot whose dir list equals the old
  snapshot's (history is never rewritten, matching Iceberg's
  ``rollback_to_snapshot`` procedure).

Scale notes: the metadata log is O(snapshots) tiny JSON files — the
driver never touches data; reads plan ``spark.read.parquet(dir, ...)``
over the snapshot's dirs so Catalyst sees one multi-path scan
(partition pruning / pushdown apply normally); MERGE reads the parent
snapshot and writes a full new data dir, i.e. a copy-on-write MERGE
(Iceberg CoW mode — the right default for bulk pipelines). DELETEs are
merge-on-read (Iceberg v2): ``delete_where``/``delete_keys`` commit
equality-delete files under ``<name>/deletes/`` instead of rewriting
data; reads anti-join each data dir against the delete files sequenced
after it (``dir_seqs`` in the manifest are Iceberg's data sequence
numbers), and ``compact`` folds deletes in and clears them.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


_PROMOTABLE = {("int", "bigint"), ("float", "double")}


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # ---------- paths ----------
    def _meta_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name, "metadata")

    def _data_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name, "data")

    def _delete_dir(self, name: str) -> str:
        return os.path.join(self.base_dir, name, "deletes")

    def _hint_path(self, name: str) -> str:
        return os.path.join(self._meta_dir(name), "version-hint.text")

    def _manifest_path(self, name: str, sid: int) -> str:
        return os.path.join(self._meta_dir(name), f"v{sid}.json")

    # ---------- metadata ----------
    def exists(self, name: str) -> bool:
        return os.path.exists(self._hint_path(name))

    def current_snapshot_id(self, name: str) -> int | None:
        try:
            with open(self._hint_path(name)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _load_manifest(self, name: str, sid: int) -> dict:
        p = self._manifest_path(name, sid)
        if not os.path.exists(p):
            raise ValueError(
                f"table '{name}' has no snapshot {sid} (expired or never "
                f"existed); available: {[s['snapshot_id'] for s in self.history(name)]}"
            )
        with open(p) as f:
            return json.load(f)

    def history(self, name: str) -> list[dict]:
        """All retained snapshots, oldest first (Iceberg ``table.history()``)."""
        md = self._meta_dir(name)
        if not os.path.isdir(md):
            return []
        sids = sorted(
            int(f[1:-5])
            for f in os.listdir(md)
            if f.startswith("v") and f.endswith(".json")
        )
        return [self._load_manifest(name, s) for s in sids]

    # ---------- named refs (Iceberg tags) ----------
    def _refs_path(self, name: str) -> str:
        return os.path.join(self._meta_dir(name), "refs.json")

    def refs(self, name: str) -> dict:
        """Named refs: {tag_name: snapshot_id}. Tags are immutable named
        snapshots (Iceberg ``refs`` of type tag) — audit marks like
        'corpus-v5-release' that survive ``expire_snapshots``."""
        try:
            with open(self._refs_path(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write_refs(self, name: str, refs: dict) -> None:
        tmp = self._refs_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(refs, f, indent=1, sort_keys=True)
        os.rename(tmp, self._refs_path(name))

    def create_tag(
        self, name: str, tag: str, snapshot_id: int | None = None
    ) -> int:
        """Tag a snapshot (default: current). Tagged snapshots are
        pinned: expire_snapshots retains their manifests and data."""
        sid = snapshot_id or self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        self._load_manifest(name, sid)  # must exist (not expired)
        refs = self.refs(name)
        if tag in refs:
            raise ValueError(
                f"tag '{tag}' already exists on '{name}' "
                f"(at snapshot {refs[tag]}); drop_tag first"
            )
        refs[tag] = sid
        self._write_refs(name, refs)
        return sid

    def drop_tag(self, name: str, tag: str) -> None:
        refs = self.refs(name)
        if tag not in refs:
            raise ValueError(f"no tag '{tag}' on '{name}'")
        del refs[tag]
        self._write_refs(name, refs)

    # ---------- branches (Iceberg branch refs / WAP) ----------
    def _branches_path(self, name: str) -> str:
        return os.path.join(self._meta_dir(name), "branches.json")

    def _branch_meta(self, name: str) -> dict:
        """{branch: {"sid": head, "gen": lineage-id}}. ``gen`` is minted
        by create_branch; dropping and recreating a branch name starts a
        NEW lineage, so staged manifests of the dead incarnation can
        never be mistaken for concurrent commits on the new one."""
        try:
            with open(self._branches_path(name)) as f:
                raw = json.load(f)
        except FileNotFoundError:
            return {}
        return {
            b: (m if isinstance(m, dict) else {"sid": m, "gen": None})
            for b, m in raw.items()
        }

    def branches(self, name: str) -> dict:
        """Named MUTABLE refs: {branch_name: head snapshot_id}. Unlike
        tags, a branch head advances when you commit to it — the
        Iceberg branch ref type, and the substrate for write-audit-
        publish (WAP): stage commits on a branch, audit them, then
        ``fast_forward`` main onto the branch head to publish."""
        return {b: m["sid"] for b, m in self._branch_meta(name).items()}

    def _write_branches(self, name: str, branches: dict) -> None:
        tmp = self._branches_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(branches, f, indent=1, sort_keys=True)
        os.rename(tmp, self._branches_path(name))

    def create_branch(
        self, name: str, branch: str, snapshot_id: int | None = None
    ) -> int:
        """Branch off a snapshot (default: current main head). The
        branch head is pinned through ``expire_snapshots`` like a tag,
        but commits with ``branch=`` advance it without touching what
        main readers see."""
        if branch == "main":
            raise ValueError("'main' is the table itself; pick another name")
        sid = snapshot_id or self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        self._load_manifest(name, sid)  # must exist (not expired)
        if branch in self.refs(name):
            raise ValueError(
                f"'{branch}' already names a tag on '{name}' (refs share "
                "one namespace); drop_tag first"
            )
        meta = self._branch_meta(name)
        if branch in meta:
            raise ValueError(
                f"branch '{branch}' already exists on '{name}' "
                f"(at snapshot {meta[branch]['sid']}); drop_branch first"
            )
        meta[branch] = {"sid": sid, "gen": uuid.uuid4().hex[:8]}
        self._write_branches(name, meta)
        return sid

    def drop_branch(self, name: str, branch: str) -> None:
        meta = self._branch_meta(name)
        if branch not in meta:
            raise ValueError(f"no branch '{branch}' on '{name}'")
        del meta[branch]
        self._write_branches(name, meta)

    def _ref_head(self, name: str, branch: str | None) -> int | None:
        """Head snapshot id of a branch, or of main (the hint) when
        ``branch`` is None."""
        if branch is None:
            return self.current_snapshot_id(name)
        meta = self._branch_meta(name)
        if branch not in meta:
            raise ValueError(f"no branch '{branch}' on '{name}'")
        return meta[branch]["sid"]

    def _next_sid(self, name: str) -> int:
        """Next globally-unique snapshot id: 1 + max over ALL retained
        manifests (not just the main head — a branch may have advanced
        past it). O(snapshots) driver-side listdir."""
        md = self._meta_dir(name)
        if not os.path.isdir(md):
            return 1
        sids = [
            int(f[1:-5])
            for f in os.listdir(md)
            if f.startswith("v") and f.endswith(".json")
        ]
        return (max(sids) if sids else 0) + 1

    def _is_ancestor(self, name: str, ancestor: int, descendant: int) -> bool:
        """Walk the parent_id chain from ``descendant`` down. A missing
        (expired) manifest breaks the chain → not provably an ancestor."""
        sid = descendant
        while sid is not None:
            if sid == ancestor:
                return True
            try:
                sid = self._load_manifest(name, sid).get("parent_id")
            except ValueError:
                return False
        return False

    def fast_forward(self, name: str, branch: str) -> int:
        """Publish a branch: repoint main to the branch head (Iceberg
        ``fast_forward('main', branch)`` — the WAP publish step). Only
        legal when main's current snapshot is an ancestor of the branch
        head; a diverged main (someone committed to it after the branch
        forked) raises instead of silently dropping those commits."""
        head = self._ref_head(name, branch)
        cur = self.current_snapshot_id(name)
        if cur is None:
            raise ValueError(f"unknown table '{name}'")
        if cur == head:
            return head
        if not self._is_ancestor(name, cur, head):
            raise ValueError(
                f"cannot fast-forward '{name}' to branch '{branch}' "
                f"(head v{head}): main (v{cur}) is not an ancestor — "
                "main diverged after the branch forked; rebase the "
                "branch (re-stage its commits) or rollback main first"
            )
        htmp = self._hint_path(name) + ".tmp"
        with open(htmp, "w") as f:
            f.write(str(head))
        os.rename(htmp, self._hint_path(name))
        return head

    @staticmethod
    def _derive_fields(
        parent_fields: list[dict] | None, schema_json: str | None,
        next_id_floor: int = 0,
    ) -> tuple[list[dict], bool]:
        """Iceberg-style field-id assignment: match the commit's schema
        to the parent's fields BY NAME (same name keeps its id), assign
        fresh ids to new columns, record the current type per id.
        ``next_id_floor`` is the table's last-ever-assigned column id
        (Iceberg's ``last-column-id``): fresh ids start ABOVE it, so an
        id retired by ``drop_column`` is never reused — a re-added
        same-name column gets a fresh id and the old physical data
        stays invisible. Returns (fields, changed) where ``changed``
        flags any rename survivor (id present, type changed) — i.e. a
        promotion — so the manifest can mark that per-dir resolution is
        required on read. Renames themselves never pass through here
        (they commit explicit fields via ``rename_column``)."""
        if not schema_json:
            return list(parent_fields or []), False
        from pyspark.sql.types import StructType

        cur = StructType.fromJson(json.loads(schema_json))
        by_name = {f["name"]: f for f in (parent_fields or [])}
        next_id = max(
            max((f["id"] for f in (parent_fields or [])), default=0),
            next_id_floor,
        ) + 1
        fields, changed = [], False
        for f in cur.fields:
            t = f.dataType.simpleString()
            if f.name in by_name:
                old = by_name[f.name]
                if old["type"] != t:
                    changed = True
                fields.append({"id": old["id"], "name": f.name, "type": t})
            else:
                fields.append({"id": next_id, "name": f.name, "type": t})
                next_id += 1
        return fields, changed

    def _commit(self, name: str, operation: str, data_dirs: list[str],
                added_files: int, summary: dict | None = None,
                partition_by: list[str] | None = None,
                schema_json: str | None = None,
                extra: dict | None = None,
                branch: str | None = None,
                fields: list[dict] | None = None) -> int:
        """Write manifest v<N+1> then atomically repoint the ref — the
        main hint, or the branch pointer when committing to a branch
        (main readers never see branch commits until ``fast_forward``).
        Snapshot ids are unique across refs (``_next_sid`` scans all
        manifests), so a branch advancing past main can't collide with
        main's next commit. The table schema travels in the manifest
        (as Iceberg's does) so an empty snapshot — e.g. an empty
        partitioned commit, which writes NO parquet files — still reads
        back with the right columns."""
        os.makedirs(self._meta_dir(name), exist_ok=True)
        parent = self._ref_head(name, branch)
        sid = self._next_sid(name)
        # CAS: a racing writer on the SAME ref committed a sibling
        # manifest (same parent) that our ref pointer hasn't absorbed
        # yet — publishing ours would silently drop theirs. Manifests
        # on OTHER refs sharing the parent are fine (that's a fork),
        # and so are manifests from a DEAD branch incarnation (the
        # branch was dropped; ``gen`` changed) — those are abandoned
        # stages awaiting GC, not live racers.
        ref = branch or "main"
        gen = (
            self._branch_meta(name).get(branch, {}).get("gen")
            if branch is not None
            else None
        )
        for other in range((parent or 0) + 1, sid):
            try:
                om = self._load_manifest(name, other)
            except ValueError:
                continue  # expired
            if om.get("ref", "main") != ref or om.get("parent_id") != parent:
                continue
            if branch is not None and om.get("ref_gen") != gen:
                continue  # dropped incarnation's abandoned stage
            raise RuntimeError(
                f"concurrent commit detected on '{name}' ref "
                f"'{ref}': snapshot v{other} has the same parent "
                f"(v{parent}); retry from the new head"
            )
        pman = self._load_manifest(name, parent) if parent else {}
        if schema_json is None and parent:
            schema_json = pman.get("schema_json")
        # Iceberg-style id-based column metadata: every manifest carries
        # (a) `fields` — the CURRENT id→(name, type) schema — and
        # (b) `dir_fields` — per data dir, the id→[physical name,
        # physical type] map the dir was WRITTEN with (new dirs get the
        # current map; carried dirs keep theirs). `ids_evolved` is
        # recomputed each commit: true iff some dir's physical layout
        # differs from the current schema (a rename or type promotion
        # whose old dirs still exist), which switches reads to per-dir
        # id resolution. Tables that never rename/promote — and renamed
        # tables once compaction rewrites every dir — stay on the fast
        # shared-scan path.
        # last-column-id floor: the max id this table has EVER assigned
        # (parent's recorded value, else the max over parent fields),
        # so fresh ids never collide with ids retired by drop_column
        parent_last = pman.get("last_column_id") or max(
            (f["id"] for f in (pman.get("fields") or [])), default=0
        )
        if fields is None:
            fields, _ = self._derive_fields(
                pman.get("fields"), schema_json, parent_last
            )
        last_column_id = max(
            parent_last, max((f["id"] for f in fields), default=0)
        )
        cur_map = {str(f["id"]): [f["name"], f["type"]] for f in fields}
        dir_fields = {
            d: m
            for d, m in (pman.get("dir_fields") or {}).items()
            if d in data_dirs
        }
        # dirs carried over from a legacy (pre-id) parent were written
        # under the PARENT's names — they must not pick up a rename this
        # commit introduces; genuinely new dirs use the current map
        pf = pman.get("fields")
        if pf is None and pman.get("schema_json"):
            pf, _ = self._derive_fields(None, pman.get("schema_json"))
        parent_map = (
            {str(f["id"]): [f["name"], f["type"]] for f in pf}
            if pf
            else cur_map
        )
        parent_dirs = set(pman.get("data_dirs") or [])
        for d in data_dirs:
            if d not in dir_fields:
                dir_fields[d] = parent_map if d in parent_dirs else cur_map
        by_id = {str(f["id"]): f for f in fields}
        cur_names = {f["name"] for f in fields}
        # per-dir id resolution is needed when (a) a live id's physical
        # name/type differs from the current schema (rename/promotion
        # whose old dirs still exist), or (b) a DROPPED id's physical
        # column shares a name with a current field — the drop-then-
        # re-add case, where a by-name fast-path read would resurrect
        # the old data under the fresh field id
        ids_evolved = any(
            (
                fid in by_id
                and (
                    (e[0] if isinstance(e, list) else e)
                    != by_id[fid]["name"]
                    or (isinstance(e, list) and e[1] != by_id[fid]["type"])
                )
            )
            or (
                fid not in by_id
                and (e[0] if isinstance(e, list) else e) in cur_names
            )
            for m in dir_fields.values()
            for fid, e in m.items()
        )
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "operation": operation,
            "ref": ref,
            **({"ref_gen": gen} if branch is not None else {}),
            "timestamp": time.time(),
            "data_dirs": sorted(data_dirs),
            "partition_by": partition_by or [],
            "schema_json": schema_json,
            "fields": fields,
            "last_column_id": last_column_id,
            "dir_fields": dir_fields,
            "ids_evolved": ids_evolved,
            "summary": {"added_data_files": added_files, **(summary or {})},
            **(extra or {}),
        }
        mp = self._manifest_path(name, sid)
        if os.path.exists(mp):  # lost a commit race: another writer took sid
            raise RuntimeError(
                f"concurrent commit detected on '{name}' at v{sid}; retry"
            )
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.rename(tmp, mp)
        if branch is not None:
            meta = self._branch_meta(name)
            meta[branch] = {**meta.get(branch, {"gen": None}), "sid": sid}
            self._write_branches(name, meta)
            return sid
        htmp = self._hint_path(name) + ".tmp"
        with open(htmp, "w") as f:
            f.write(str(sid))
        os.rename(htmp, self._hint_path(name))
        return sid

    def _write_new_dir(
        self, df: DataFrame, name: str, partition_by: list[str] | None = None,
        root: str | None = None,
    ) -> tuple[str, int]:
        """Materialize df into a fresh immutable data dir; return
        (relative dir name, parquet file count)."""
        rel = uuid.uuid4().hex[:12]
        full = os.path.join(root or self._data_dir(name), rel)
        w = df.write.mode("error")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(full)
        n = sum(
            1
            for _, _, fs in os.walk(full)
            for f in fs
            if f.endswith(".parquet")
        )
        return rel, n

    def _collect_file_stats(self, name: str, rel: str) -> dict:
        """Per-file column min/max from the parquet footers — what
        Iceberg's manifest writer records as ``lower_bounds`` /
        ``upper_bounds`` so scan PLANNING can skip files without opening
        them. Driver-side O(files) footer reads at commit time (the
        manifest-writer job); only JSON-stable primitive stats (int,
        float, str, bool) are kept — other types simply aren't pruned
        on. Returns {relative_file_path: {col: [min, max]}}."""
        import pyarrow.parquet as pq

        root = os.path.join(self._data_dir(name), rel)
        out: dict[str, dict] = {}
        for cur, _, fs in os.walk(root):
            for f in fs:
                if not f.endswith(".parquet"):
                    continue
                p = os.path.join(cur, f)
                md = pq.read_metadata(p)
                cols: dict[str, list] = {}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        st = c.statistics
                        if st is None or not st.has_min_max:
                            cols[c.path_in_schema] = None  # unknown
                            continue
                        lo, hi = st.min, st.max
                        if isinstance(lo, bytes):
                            try:
                                lo, hi = lo.decode(), hi.decode()
                            except UnicodeDecodeError:
                                cols[c.path_in_schema] = None
                                continue
                        if not isinstance(lo, (int, float, str, bool)):
                            cols[c.path_in_schema] = None
                            continue
                        prev = cols.get(c.path_in_schema)
                        if c.path_in_schema in cols and prev is None:
                            continue
                        if prev is None:
                            cols[c.path_in_schema] = [lo, hi]
                        else:
                            cols[c.path_in_schema] = [
                                min(prev[0], lo), max(prev[1], hi)
                            ]
                out[os.path.relpath(p, root)] = {
                    k: v for k, v in cols.items() if v is not None
                }
        return out

    def plan_files(
        self,
        name: str,
        col: str,
        lo=None,
        hi=None,
        snapshot_id: int | None = None,
    ) -> dict:
        """Planning-time file pruning from manifest stats (Iceberg's
        scan planning): files whose recorded [min, max] for ``col``
        cannot intersect [lo, hi] are skipped WITHOUT opening them —
        the step parquet footer pruning cannot do, because footers
        require touching every file. Files with no recorded stats for
        the column are conservatively kept. Returns
        {dir: [file, ...]} of candidate files plus counts."""
        sid = snapshot_id or self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        stats = man.get("file_stats") or {}
        selected: dict[str, list[str]] = {}
        total = kept = 0
        for d in man["data_dirs"]:
            dstats = stats.get(d)
            dpath = os.path.join(self._data_dir(name), d)
            files = [
                os.path.relpath(os.path.join(cur, f), dpath)
                for cur, _, fs in os.walk(dpath)
                for f in fs
                if f.endswith(".parquet")
            ]
            total += len(files)
            keep = []
            for f in files:
                mm = (dstats or {}).get(f, {}).get(col)
                if mm is not None and (
                    (hi is not None and mm[0] > hi)
                    or (lo is not None and mm[1] < lo)
                ):
                    continue
                keep.append(f)
            kept += len(keep)
            selected[d] = keep
        return {"files": selected, "total_files": total, "kept_files": kept}

    # ---------- bloom file index (Iceberg Puffin-style sidecar) ----------

    BLOOM_BITS = 256
    BLOOM_HASHES = 4

    def _bloom_path(self, name: str, col: str) -> str:
        return os.path.join(self._meta_dir(name), f"bloom_{col}.json")

    @staticmethod
    def _bloom_positions(value: str) -> list[int]:
        """The k bit positions for a value — md5-derived, the exact
        python twin of the Spark-side expression in
        ``build_bloom_index`` (hex32 of 'bloom{j}|' + value)."""
        import hashlib

        out = []
        for j in range(SnapshotCatalog.BLOOM_HASHES):
            h = int(
                hashlib.md5(f"bloom{j}|{value}".encode()).hexdigest()[:8], 16
            )
            out.append(h % SnapshotCatalog.BLOOM_BITS)
        return out

    def build_bloom_index(self, name: str, col: str) -> dict:
        """Build a per-FILE Bloom filter over ``col`` and store it as a
        metadata sidecar — the Iceberg Puffin-blob idiom: min/max
        manifest stats prune RANGE predicates on clustered columns, but
        an equality probe on a column the table is NOT sorted by
        intersects every [min,max]; a 256-bit per-file bloom skips the
        files that cannot contain the value. One distributed job: scan
        with ``_metadata.file_path`` (zero extra I/O), k=4 md5-derived
        bit positions per value JVM-side, one (file, word) bit_or
        aggregate — only files×4 rows reach the driver. Data files are
        immutable, so file-level blooms stay valid across ALL later
        commits; files appended after the build simply have no entry
        and are conservatively kept by ``plan_files_eq`` until the next
        index build (run it like compaction, on a schedule)."""
        from pyspark.sql import functions as F

        from ..functions.util import hex32

        sid = self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        df = self._scan(name, man, with_pos=True).select(
            F.col("_pos_fp").alias("fp"),
            F.col(col).cast("string").alias("v"),
        ).filter(F.col("v").isNotNull())
        bits = None
        for j in range(self.BLOOM_HASHES):
            h = hex32(F.concat(F.lit(f"bloom{j}|"), F.col("v")))
            part = df.select("fp", (h % self.BLOOM_BITS).alias("bit"))
            bits = part if bits is None else bits.unionByName(part)
        words = (
            bits.distinct()
            .select(
                "fp",
                (F.col("bit") / 64).cast("int").alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("m"),
            )
            .groupBy("fp", "w")
            .agg(F.bit_or("m").alias("word"))
        )
        droot = os.path.realpath(self._data_dir(name))
        index: dict[str, list[int]] = {}
        for r in words.collect():  # O(files x 4) rows — manifest-sized
            fp = r["fp"]
            if fp.startswith("file:"):
                fp = fp[len("file:"):]
                while fp.startswith("//"):
                    fp = fp[1:]
            rel = os.path.relpath(os.path.realpath(fp), droot)
            wlist = index.setdefault(rel, [0] * (self.BLOOM_BITS // 64))
            wlist[r["w"]] |= int(r["word"])
        payload = {
            "col": col,
            "bits": self.BLOOM_BITS,
            "hashes": self.BLOOM_HASHES,
            "built_at_snapshot": sid,
            "files": index,
        }
        tmp = self._bloom_path(name, col) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, self._bloom_path(name, col))
        return {"files_indexed": len(index), "snapshot_id": sid}

    def plan_files_eq(self, name: str, col: str, value) -> dict:
        """Equality-probe file pruning from the bloom sidecar: skip
        files whose bloom provably excludes ``value``; files without an
        entry (appended after the index build) are conservatively
        kept."""
        sid = self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        path = self._bloom_path(name, col)
        blooms = {}
        if os.path.exists(path):
            with open(path) as fh:
                blooms = json.load(fh).get("files", {})
        pos = self._bloom_positions(str(value))
        selected: dict[str, list[str]] = {}
        total = kept = 0
        for d in man["data_dirs"]:
            dpath = os.path.join(self._data_dir(name), d)
            files = [
                os.path.relpath(os.path.join(cur, f), dpath)
                for cur, _, fs in os.walk(dpath)
                for f in fs
                if f.endswith(".parquet")
            ]
            total += len(files)
            keep = []
            for f in files:
                words = blooms.get(os.path.join(d, f))
                if words is not None and any(
                    not (words[p // 64] >> (p % 64)) & 1 for p in pos
                ):
                    continue  # bloom proves the value is absent
                keep.append(f)
            kept += len(keep)
            selected[d] = keep
        return {"files": selected, "total_files": total, "kept_files": kept}

    def _ndv_path(self, name: str) -> str:
        return os.path.join(self._meta_dir(name), "ndv_stats.json")

    def build_ndv_stats(self, name: str) -> dict:
        """Table-level column statistics (Iceberg's ``ANALYZE TABLE`` /
        Puffin theta-sketch blobs): per-column approximate
        distinct-value counts (HyperLogLog++, 2% rsd), null counts, and
        the row count, from ONE aggregate pass over the current
        snapshot. A cost-based planner prices joins and group-bys from
        these without touching data (``join_card_est`` shows the
        per-query variant); stored as a metadata sidecar stamped with
        the snapshot it was built at, so consumers can see staleness
        and re-run like any maintenance job."""
        from pyspark.sql import functions as F

        sid = self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        df = self.read(name, snapshot_id=sid)
        aggs = [F.count("*").alias("__rows")]
        for c in df.columns:
            aggs.append(F.approx_count_distinct(c, 0.02).alias(f"ndv__{c}"))
            aggs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"nulls__{c}")
            )
        row = df.agg(*aggs).collect()[0].asDict()
        payload = {
            "built_at_snapshot": sid,
            "row_count": int(row["__rows"]),
            "columns": {
                c: {
                    "ndv": int(row[f"ndv__{c}"]),
                    "nulls": int(row[f"nulls__{c}"]),
                }
                for c in df.columns
            },
        }
        tmp = self._ndv_path(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, self._ndv_path(name))
        return payload

    def table_stats(self, name: str) -> dict | None:
        """The last ``build_ndv_stats`` result, or None if never built.
        ``built_at_snapshot`` vs ``current_snapshot_id`` tells the
        caller how stale it is."""
        path = self._ndv_path(name)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    def read_eq(self, name: str, col: str, value) -> DataFrame:
        """Equality read through the bloom file index: scan only the
        files ``plan_files_eq`` kept, apply merge-on-read deletes, then
        the residual equality filter (blooms give false positives,
        never false negatives — the filter is still mandatory)."""
        from pyspark.sql import functions as F

        sid = self.current_snapshot_id(name)
        man = self._load_manifest(name, sid)
        plan = self.plan_files_eq(name, col, value)
        out = self._read_planned(name, man, plan)
        if out is None:
            return self.read(name, snapshot_id=sid).limit(0)
        return out.where(F.col(col) == F.lit(value))

    def read_where(
        self,
        name: str,
        col: str,
        lo=None,
        hi=None,
        snapshot_id: int | None = None,
    ) -> DataFrame:
        """Range-predicate read with manifest-stats file pruning: scan
        only the files ``plan_files`` kept, then apply the residual
        filter (pruning is conservative, never a substitute for it).
        Composes with merge-on-read deletes — each data dir's surviving
        files are still anti-joined against the delete files sequenced
        after it. On a sort-order-compacted table this reads O(matching
        files) of a 100 TB table and plans O(1) jobs."""
        from pyspark.sql import functions as F

        sid = snapshot_id or self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        plan = self.plan_files(name, col, lo, hi, snapshot_id=sid)
        out = self._read_planned(name, man, plan)
        if out is None:
            return self.read(name, snapshot_id=sid).limit(0)
        if lo is not None:
            out = out.where(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.where(F.col(col) <= F.lit(hi))
        return out

    def _read_planned(self, name: str, man: dict, plan: dict):
        """Scan only a file plan's surviving files, applying
        merge-on-read deletes per data dir's sequence number. Shared by
        ``read_where`` (min/max range pruning) and ``read_eq`` (bloom
        equality pruning). Returns None when the plan kept nothing."""
        from pyspark.sql import functions as F

        dels, groups = self._delete_plan(man)
        specs = man.get("dir_specs") or {}
        default = man.get("partition_by") or []
        out = None
        for applicable, dirs in sorted(groups.items()):
            entries = [dels[i] for i in applicable]
            need_pos = any(e.get("positional") for e in entries)

            def _pos(df):
                if not need_pos:
                    return df
                return df.select(
                    "*",
                    F.col("_metadata.file_path").alias("_pos_fp"),
                    F.col("_metadata.row_index").alias("_pos_idx"),
                )

            flat_paths = []
            sub = None
            for d in dirs:
                dpath = os.path.join(self._data_dir(name), d)
                fs = [os.path.join(dpath, f) for f in plan["files"][d]]
                if not fs:
                    continue
                if man.get("ids_evolved"):
                    # renamed/promoted tables resolve per dir by field id
                    part = self._resolve_dir(
                        _pos(self.spark.read.option(
                            "basePath", dpath
                        ).parquet(*fs)),
                        d,
                        man,
                    )
                    sub = (
                        part
                        if sub is None
                        else sub.unionByName(part, allowMissingColumns=True)
                    )
                elif specs.get(d, default):
                    # per-dir basePath read keeps hive partition columns
                    part = _pos(self.spark.read.option(
                        "basePath", dpath
                    ).parquet(*fs))
                    sub = (
                        part
                        if sub is None
                        else sub.unionByName(part, allowMissingColumns=True)
                    )
                else:
                    flat_paths.extend(fs)
            if flat_paths:
                r = self.spark.read
                if len(flat_paths) > 1:
                    r = r.option("mergeSchema", "true")
                part = _pos(r.parquet(*flat_paths))
                sub = (
                    part
                    if sub is None
                    else sub.unionByName(part, allowMissingColumns=True)
                )
            if sub is None:
                continue
            sub = self._align(sub, man)
            sub = self._apply_deletes(sub, name, entries)
            if need_pos:
                sub = sub.drop("_pos_fp", "_pos_idx")
            out = sub if out is None else out.unionByName(sub)
        return out

    def _parent_partition_by(
        self, name: str, partition_by: list[str] | None,
        evolve: bool = False, branch: str | None = None,
    ) -> list[str]:
        """Resolve the commit's partition spec: inherit the parent
        snapshot's when not given. A CHANGED spec requires an explicit
        ``evolve_spec=True`` (Iceberg's partition-spec evolution):
        old dirs keep the spec they were written with (recorded in the
        manifest's ``dir_specs``), new writes use the new one — a silent
        change is refused because it is usually a bug."""
        parent = self._ref_head(name, branch)
        inherited = (
            self._load_manifest(name, parent).get("partition_by", [])
            if parent
            else []
        )
        if partition_by is None:
            return inherited
        if parent and list(partition_by) != inherited and not evolve:
            raise ValueError(
                f"table '{name}' is partitioned by {inherited}; appending "
                f"with partition_by={list(partition_by)} changes the "
                "partition spec — pass evolve_spec=True to evolve it "
                "(old data dirs keep their original layout)"
            )
        return list(partition_by)

    def _evolved_schema_json(
        self, name: str, df: DataFrame, branch: str | None = None
    ) -> str:
        """ADD-ONLY schema evolution (Iceberg add-column): the new
        snapshot's schema is the parent schema plus any new columns in
        ``df`` (appends may also OMIT existing columns — readers
        null-fill from the manifest schema). Widening type promotions
        (int→bigint, float→double) evolve the table schema in place —
        old dirs keep their physical type and readers up-cast by field
        id. Narrowing writes and renames-by-append raise: conform the
        df (renames go through ``rename_column``)."""
        from pyspark.sql.types import StructType

        parent = self._ref_head(name, branch)
        pj = (
            self._load_manifest(name, parent).get("schema_json")
            if parent
            else None
        )
        if not pj:
            return df.schema.json()
        ps = StructType.fromJson(json.loads(pj))
        known = {f.name: i for i, f in enumerate(ps.fields)}
        out = list(ps.fields)
        for f in df.schema.fields:
            if f.name in known:
                have = out[known[f.name]]
                if f.dataType != have.dataType:
                    a = have.dataType.simpleString()
                    b = f.dataType.simpleString()
                    if (a, b) in _PROMOTABLE:
                        out[known[f.name]] = f  # widen the table schema
                    elif (b, a) in _PROMOTABLE:
                        raise ValueError(
                            f"table '{name}': appending '{f.name}' as "
                            f"{b} into a {a} column narrows it — cast "
                            f"the DataFrame to {a} before appending"
                        )
                    else:
                        raise ValueError(
                            f"table '{name}': column '{f.name}' type "
                            f"change {a} -> {b} is not supported "
                            "(promotions: int->bigint, float->double)"
                        )
            else:
                out.append(f)
        return StructType(out).json()

    def rename_column(self, name: str, old: str, new: str) -> int:
        """Metadata-only column rename (Iceberg ``ALTER TABLE RENAME
        COLUMN``): commits new ``fields`` under the SAME field id — no
        data dir is touched; old dirs keep their physical name and
        every read resolves them by id. Time travel to a pre-rename
        snapshot still shows the old name (the manifest carries the
        schema of its era). Refused for partition columns (the hive
        path encodes the name), and while a merge-on-read equality
        delete references the column (``compact`` first — the tombstone
        files key on the physical name). Per-file min/max stats are
        re-keyed so range pruning keeps working; a bloom file index
        built for the old name needs an explicit rebuild."""
        sid = self._ref_head(name, None)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        fields = man.get("fields") or self._derive_fields(
            None, man.get("schema_json")
        )[0]
        names = [f["name"] for f in fields]
        if old not in names:
            raise ValueError(f"table '{name}' has no column '{old}'")
        if new in names:
            raise ValueError(f"table '{name}' already has column '{new}'")
        specs = man.get("dir_specs") or {
            d: man.get("partition_by", []) for d in man["data_dirs"]
        }
        if old in (man.get("partition_by") or []) or any(
            old in s for s in specs.values()
        ):
            # current spec OR any live dir's historical spec (partition-
            # spec evolution leaves old dirs hive-encoded under the old
            # spec): the name is baked into data paths either way
            raise ValueError(
                f"cannot rename partition column '{old}' (hive-encoded "
                "in data paths); rewrite the table with a new spec"
            )
        for e in man.get("delete_files") or []:
            if not e.get("positional") and old in (e.get("keys") or []):
                raise ValueError(
                    f"cannot rename '{old}': a merge-on-read equality "
                    "delete keys on it — run compact() first"
                )
        new_fields = [
            {**f, "name": new} if f["name"] == old else dict(f)
            for f in fields
        ]
        from pyspark.sql.types import StructField, StructType

        st = StructType.fromJson(json.loads(man["schema_json"]))
        nst = StructType(
            [
                StructField(
                    new if fd.name == old else fd.name,
                    fd.dataType,
                    fd.nullable,
                )
                for fd in st.fields
            ]
        )
        fstats = {
            rel: {
                fp: {(new if c == old else c): v for c, v in cols.items()}
                for fp, cols in files.items()
            }
            for rel, files in (man.get("file_stats") or {}).items()
        }
        # re-key metadata sidecars: the bloom index hashes VALUES only,
        # so a rename is a pure file move + label update — no rebuild;
        # same for the NDV/null column stats
        bp = self._bloom_path(name, old)
        if os.path.exists(bp):
            with open(bp) as fh:
                payload = json.load(fh)
            payload["col"] = new
            tmp = self._bloom_path(name, new) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(payload, fh)
            os.replace(tmp, self._bloom_path(name, new))
            os.remove(bp)
        if os.path.exists(self._ndv_path(name)):
            with open(self._ndv_path(name)) as fh:
                stats = json.load(fh)
            cols_stats = stats.get("columns", {})
            if old in cols_stats:
                cols_stats[new] = cols_stats.pop(old)
                tmp = self._ndv_path(name) + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(stats, fh)
                os.replace(tmp, self._ndv_path(name))
        return self._commit(
            name, "rename-column", man["data_dirs"], 0,
            summary={"renamed": f"{old}->{new}"},
            partition_by=man.get("partition_by", []),
            schema_json=nst.json(),
            fields=new_fields,
            extra={
                "dir_seqs": man.get("dir_seqs") or {},
                "delete_files": man.get("delete_files") or [],
                "dir_specs": man.get("dir_specs")
                or {d: man.get("partition_by", []) for d in man["data_dirs"]},
                "file_stats": fstats,
            },
        )

    def drop_column(self, name: str, col: str) -> int:
        """Metadata-only column drop (Iceberg ``ALTER TABLE DROP
        COLUMN``): the field id leaves the schema; no data dir is
        touched. A column later RE-ADDED under the same name gets a
        FRESH field id (``_derive_fields`` matches names against the
        post-drop schema), and id-based per-dir resolution refuses to
        resurrect the old physical column under the new id — Iceberg's
        "new column, old data invisible" semantics. Time travel to a
        pre-drop snapshot still shows the column with its values.
        Refused for partition columns of the current spec or any live
        dir's historical spec (hive-encoded in paths), while an
        equality delete keys on the column (``compact`` first), and for
        the last remaining column. The column's bloom sidecar, file
        stats, and NDV stats entries are removed."""
        sid = self._ref_head(name, None)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        fields = man.get("fields") or self._derive_fields(
            None, man.get("schema_json")
        )[0]
        names = [f["name"] for f in fields]
        if col not in names:
            raise ValueError(f"table '{name}' has no column '{col}'")
        if len(fields) == 1:
            raise ValueError("cannot drop the last remaining column")
        specs = man.get("dir_specs") or {
            d: man.get("partition_by", []) for d in man["data_dirs"]
        }
        if col in (man.get("partition_by") or []) or any(
            col in s for s in specs.values()
        ):
            raise ValueError(
                f"cannot drop partition column '{col}' (hive-encoded in "
                "data paths); rewrite the table with a new spec"
            )
        for e in man.get("delete_files") or []:
            if not e.get("positional") and col in (e.get("keys") or []):
                raise ValueError(
                    f"cannot drop '{col}': a merge-on-read equality "
                    "delete keys on it — run compact() first"
                )
        new_fields = [dict(f) for f in fields if f["name"] != col]
        from pyspark.sql.types import StructType

        st = StructType.fromJson(json.loads(man["schema_json"]))
        nst = StructType([fd for fd in st.fields if fd.name != col])
        fstats = {
            rel: {
                fp: {c: v for c, v in cols.items() if c != col}
                for fp, cols in files.items()
            }
            for rel, files in (man.get("file_stats") or {}).items()
        }
        bp = self._bloom_path(name, col)
        if os.path.exists(bp):
            os.remove(bp)
        if os.path.exists(self._ndv_path(name)):
            with open(self._ndv_path(name)) as fh:
                stats = json.load(fh)
            if col in stats.get("columns", {}):
                stats["columns"].pop(col)
                tmp = self._ndv_path(name) + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(stats, fh)
                os.replace(tmp, self._ndv_path(name))
        return self._commit(
            name, "drop-column", man["data_dirs"], 0,
            summary={"dropped": col},
            partition_by=man.get("partition_by", []),
            schema_json=nst.json(),
            fields=new_fields,
            extra={
                "dir_seqs": man.get("dir_seqs") or {},
                "delete_files": man.get("delete_files") or [],
                "dir_specs": specs,
                "file_stats": fstats,
            },
        )

    def promote_column(self, name: str, col: str, to_type: str) -> int:
        """Metadata-only type promotion (Iceberg ``ALTER COLUMN TYPE``):
        int→bigint or float→double only. Old dirs keep their physical
        type; reads up-cast by field id, so the promotion costs one
        manifest write regardless of table size."""
        sid = self._ref_head(name, None)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        fields = man.get("fields") or self._derive_fields(
            None, man.get("schema_json")
        )[0]
        cur = next((f for f in fields if f["name"] == col), None)
        if cur is None:
            raise ValueError(f"table '{name}' has no column '{col}'")
        if (cur["type"], to_type) not in _PROMOTABLE:
            raise ValueError(
                f"promotion {cur['type']} -> {to_type} is not supported "
                "(int->bigint, float->double)"
            )
        new_fields = [
            {**f, "type": to_type} if f["name"] == col else dict(f)
            for f in fields
        ]
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        wide = {"bigint": LongType(), "double": DoubleType()}[to_type]
        st = StructType.fromJson(json.loads(man["schema_json"]))
        nst = StructType(
            [
                StructField(
                    fd.name, wide if fd.name == col else fd.dataType,
                    fd.nullable,
                )
                for fd in st.fields
            ]
        )
        return self._commit(
            name, "promote-column", man["data_dirs"], 0,
            summary={"promoted": f"{col}: {cur['type']}->{to_type}"},
            partition_by=man.get("partition_by", []),
            schema_json=nst.json(),
            fields=new_fields,
            extra={
                "dir_seqs": man.get("dir_seqs") or {},
                "delete_files": man.get("delete_files") or [],
                "dir_specs": man.get("dir_specs")
                or {d: man.get("partition_by", []) for d in man["data_dirs"]},
                "file_stats": man.get("file_stats") or {},
            },
        )

    def _scan(self, name: str, man: dict, with_pos: bool = False) -> DataFrame:
        """Plan a scan over a manifest's dirs. Unpartitioned: one
        multi-path parquet read. Partitioned: one read PER dir unioned
        (Spark refuses mixed roots over hive-style layouts); partition
        filters push into EVERY branch scan (verified in tests), so
        pruning survives the union. Dirs with zero parquet files (empty
        partitioned commits) are skipped; an all-empty snapshot falls
        back to the manifest schema. ``with_pos`` attaches each row's
        physical address (``_pos_fp``/``_pos_idx`` from Spark's
        ``_metadata`` struct — zero extra I/O) for positional-delete
        resolution and application."""
        dirs = [
            os.path.join(self._data_dir(name), d)
            for d in man["data_dirs"]
            if any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(
                    os.path.join(self._data_dir(name), d)
                )
                for f in fs
            )
        ]
        if not dirs:
            if man.get("schema_json"):
                from pyspark.sql.types import StructType

                return self.spark.createDataFrame(
                    [], StructType.fromJson(json.loads(man["schema_json"]))
                )
            raise ValueError(
                f"snapshot {man['snapshot_id']} of '{name}' is empty"
            )
        # each dir is scanned under the spec it was WRITTEN with
        # (Iceberg keeps the partition spec per data file): spec
        # evolution never rewrites old dirs — hive-encoded dirs restore
        # the partition column from the path, flat dirs carry it as a
        # data column, and the union aligns both.
        specs = man.get("dir_specs") or {}
        default = man.get("partition_by") or []
        flat = [
            d
            for d in dirs
            if not specs.get(os.path.basename(d), default)
        ]
        hive = [d for d in dirs if d not in flat]

        def _pos(df: DataFrame) -> DataFrame:
            if not with_pos:
                return df
            from pyspark.sql import functions as F

            return df.select(
                "*",
                F.col("_metadata.file_path").alias("_pos_fp"),
                F.col("_metadata.row_index").alias("_pos_idx"),
            )

        if man.get("ids_evolved"):
            # a rename/promotion happened somewhere in this table's
            # history: physical column names/types differ per dir, so
            # each dir is read separately and resolved BY FIELD ID to
            # the current schema (Iceberg's per-file projection). The
            # group count is bounded by schema versions, not data size.
            out = None
            for d in dirs:
                part = self._resolve_dir(
                    _pos(self.spark.read.parquet(d)),
                    os.path.basename(d),
                    man,
                )
                out = (
                    part
                    if out is None
                    else out.unionByName(part, allowMissingColumns=True)
                )
            return self._align(out, man)
        out = None
        if flat:
            r = self.spark.read
            if len(flat) > 1:
                # dirs may carry different (evolved) schemas
                r = r.option("mergeSchema", "true")
            out = _pos(r.parquet(*flat))
        for d in hive:
            part = _pos(self.spark.read.parquet(d))
            out = (
                part
                if out is None
                else out.unionByName(part, allowMissingColumns=True)
            )
        return self._align(out, man)

    def _resolve_dir(self, df: DataFrame, rel: str, man: dict) -> DataFrame:
        """Id-based column resolution (Iceberg schema evolution): map a
        data dir's PHYSICAL columns to the manifest's current schema via
        the dir's recorded id→physical-name map, renaming and up-casting
        (int→long, float→double promotions) as needed. Columns the dir
        predates are simply absent here — ``_align`` null-fills them."""
        fields = man.get("fields")
        if not fields:
            return df
        from pyspark.sql import functions as F

        mapping = (man.get("dir_fields") or {}).get(rel) or {}
        cols = []
        for f in fields:
            if mapping:
                e = mapping.get(str(f["id"]))
                if e is None:
                    # the dir predates this field id — _align null-fills.
                    # No name fallback: a physical column with the same
                    # NAME but a different (dropped) id must stay
                    # invisible (drop-then-re-add semantics).
                    continue
                phys = e[0] if isinstance(e, list) else e
            else:  # legacy pre-id dir: resolve by name
                phys = f["name"]
            if phys in df.columns:
                cols.append(F.col(phys).cast(f["type"]).alias(f["name"]))
        for c in ("_pos_fp", "_pos_idx"):
            if c in df.columns:
                cols.append(F.col(c))
        return df.select(*cols)

    def _align(self, df: DataFrame, man: dict) -> DataFrame:
        """Project to the manifest schema: null-fill columns a data dir
        predates (add-only evolution), fix the column order."""
        if not man.get("schema_json"):
            return df
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        target = StructType.fromJson(json.loads(man["schema_json"]))
        for f in target.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        keep = [f.name for f in target.fields]
        keep += [c for c in ("_pos_fp", "_pos_idx") if c in df.columns]
        return df.select(*keep)

    # ---------- merge-on-read deletes ----------
    def _delete_plan(self, man: dict):
        """Group a manifest's data dirs by the set of delete files that
        apply to them. A delete file applies only to data dirs committed
        at a LOWER sequence number (Iceberg v2 sequence-number
        semantics), so a key re-appended AFTER its delete is visible
        again; between compactions the distinct applicable-sets are few
        (typically "all old dirs" and "dirs appended since"), so the
        read plan stays one scan + one anti-join per group."""
        dels = man.get("delete_files") or []
        seqs = man.get("dir_seqs") or {}
        groups: dict[tuple, list[str]] = {}
        for d in man["data_dirs"]:
            seq = seqs.get(d, 0)
            applicable = tuple(
                i for i, e in enumerate(dels) if e["seq"] > seq
            )
            groups.setdefault(applicable, []).append(d)
        return dels, groups

    def _apply_deletes(self, df: DataFrame, name: str, entries: list[dict]):
        """Anti-join against each delete file. Equality entries key on
        their declared columns; positional entries (Iceberg v2
        position-delete files) key on the row's physical address
        (``_pos_fp``/``_pos_idx`` — the scan must have attached them).
        Delete files are tombstone-sized either way; at scale Spark
        broadcasts them, so the data never reshuffles for a delete."""
        for e in entries:
            keys = self.spark.read.parquet(
                os.path.join(self._delete_dir(name), e["dir"])
            )
            on = (
                ["_pos_fp", "_pos_idx"]
                if e.get("positional")
                else list(e["keys"])
            )
            df = df.join(keys, on=on, how="left_anti")
        return df

    # ---------- reads ----------
    def read(
        self,
        name: str,
        snapshot_id: int | None = None,
        tag: str | None = None,
        branch: str | None = None,
    ) -> DataFrame:
        """Read the current snapshot, time-travel to ``snapshot_id``
        (Iceberg ``VERSION AS OF``), to a named ``tag``, or to a
        ``branch`` head (the WAP audit read). The returned DataFrame
        stays valid across later commits: it plans against immutable
        files. Equality-delete files (merge-on-read DELETEs) are
        applied here, per data dir's sequence number."""
        if sum(x is not None for x in (snapshot_id, tag, branch)) > 1:
            raise ValueError("pass at most one of snapshot_id / tag / branch")
        if tag is not None:
            refs = self.refs(name)
            if tag not in refs:
                raise ValueError(f"no tag '{tag}' on '{name}'")
            snapshot_id = refs[tag]
        if branch is not None:
            snapshot_id = self._ref_head(name, branch)
        sid = snapshot_id or self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        dels, groups = self._delete_plan(man)
        if not dels or not man["data_dirs"]:
            return self._scan(name, man)
        out = None
        for applicable, dirs in sorted(groups.items()):
            entries = [dels[i] for i in applicable]
            need_pos = any(e.get("positional") for e in entries)
            sub = self._scan(name, {**man, "data_dirs": dirs}, with_pos=need_pos)
            sub = self._apply_deletes(sub, name, entries)
            if need_pos:
                sub = sub.drop("_pos_fp", "_pos_idx")
            out = sub if out is None else out.unionByName(sub)
        return out

    def read_incremental(
        self, name: str, from_snapshot: int, to_snapshot: int | None = None
    ) -> DataFrame:
        """Incremental scan: ONLY the data added after ``from_snapshot``
        up to ``to_snapshot`` (default: current) — Iceberg's
        ``incremental read`` / CDC-append pattern. A downstream batch job
        (dedup refresh, index build, metrics rollup) processes each new
        snapshot's delta instead of rescanning the table: at 10¹² docs
        this is the difference between touching a day's crawl and
        touching the corpus. Dir-granularity manifests make the delta
        exact set difference; appends qualify, while an intervening
        overwrite/merge (which REPLACES dirs) raises rather than silently
        returning rewritten-as-new data."""
        to_sid = to_snapshot or self.current_snapshot_id(name)
        if to_sid is None:
            raise ValueError(f"unknown table '{name}'")
        man_from = self._load_manifest(name, from_snapshot)
        man_to = self._load_manifest(name, to_sid)
        base, cur = set(man_from["data_dirs"]), set(man_to["data_dirs"])
        if not base <= cur:
            raise ValueError(
                f"snapshots {from_snapshot}..{to_sid} of '{name}' are not "
                "append-only (an overwrite/merge replaced data in between); "
                "incremental read would mis-report rewritten rows as new"
            )
        if (man_from.get("delete_files") or []) != (
            man_to.get("delete_files") or []
        ):
            raise ValueError(
                f"snapshots {from_snapshot}..{to_sid} of '{name}' are not "
                "append-only (a merge-on-read DELETE committed in "
                "between); an append-only incremental read cannot "
                "represent row removals — consume the delete files as "
                "CDC tombstones instead"
            )
        delta = sorted(cur - base)
        if not delta:
            schema = self.read(name, snapshot_id=to_sid).schema
            return self.spark.createDataFrame([], schema)
        return self._scan(
            name,
            {
                "snapshot_id": to_sid,
                "data_dirs": delta,
                "partition_by": man_to.get("partition_by", []),
                # id-resolution metadata rides along so deltas of a
                # renamed/promoted table resolve to the current schema
                "fields": man_to.get("fields"),
                "dir_fields": man_to.get("dir_fields"),
                "ids_evolved": man_to.get("ids_evolved"),
                "schema_json": man_to.get("schema_json"),
            },
        )

    def read_changes(
        self, name: str, from_snapshot: int, to_snapshot: int | None = None
    ) -> DataFrame:
        """Changelog read (Iceberg ``create_changelog_view``): every
        row-level change between two snapshots as (row, _change_type,
        _change_ordinal) — inserts from appended data dirs AND deletes
        from merge-on-read tombstones (which ``read_incremental``, being
        append-only, must refuse). Delete rows carry the equality-key
        columns with everything else null. Applying the changes to the
        old snapshot in _change_ordinal order reproduces the new one
        exactly (test-asserted) — the downstream-MERGE contract that
        lets an index/dedup/metrics job consume takedowns as CDC instead
        of rescanning the corpus. Ranges crossing an overwrite / merge /
        replace still raise: those rewrite data dirs and the diff is no
        longer derivable from metadata."""
        from pyspark.sql import functions as F

        to_sid = to_snapshot or self.current_snapshot_id(name)
        if to_sid is None:
            raise ValueError(f"unknown table '{name}'")
        man_from = self._load_manifest(name, from_snapshot)
        man_to = self._load_manifest(name, to_sid)
        base, cur = set(man_from["data_dirs"]), set(man_to["data_dirs"])
        if not base <= cur:
            raise ValueError(
                f"snapshots {from_snapshot}..{to_sid} of '{name}' cross "
                "an overwrite/merge/replace; the row-level diff is not "
                "derivable from metadata"
            )
        dels_from = man_from.get("delete_files") or []
        dels_to = man_to.get("delete_files") or []
        if dels_to[: len(dels_from)] != dels_from:
            raise ValueError(
                f"snapshots {from_snapshot}..{to_sid} of '{name}' cross "
                "a compaction that folded delete files in; the diff is "
                "not derivable from metadata"
            )
        seqs = man_to.get("dir_seqs") or {}
        parts = []
        for d in sorted(cur - base):
            sub = self._scan(name, {**man_to, "data_dirs": [d]})
            parts.append(
                sub.select(
                    "*",
                    F.lit("insert").alias("_change_type"),
                    F.lit(seqs.get(d, 0)).cast("long").alias(
                        "_change_ordinal"
                    ),
                )
            )
        for e in dels_to[len(dels_from):]:
            keys = self.spark.read.parquet(
                os.path.join(self._delete_dir(name), e["dir"])
            )
            if e.get("positional"):
                # a position tombstone names addresses, not content:
                # re-read the deleted rows BY ADDRESS from the dirs the
                # entry applies to, so the changelog carries full rows
                # (richer than equality deletes' null-padded keys)
                applies = [
                    d for d in man_to["data_dirs"]
                    if e["seq"] > seqs.get(d, 0)
                ]
                rows = self._scan(
                    name, {**man_to, "data_dirs": applies}, with_pos=True
                ).join(keys, ["_pos_fp", "_pos_idx"], "semi").drop(
                    "_pos_fp", "_pos_idx"
                )
                parts.append(
                    rows.select(
                        "*",
                        F.lit("delete").alias("_change_type"),
                        F.lit(e["seq"]).cast("long").alias(
                            "_change_ordinal"
                        ),
                    )
                )
                continue
            parts.append(
                keys.select(
                    "*",
                    F.lit("delete").alias("_change_type"),
                    F.lit(e["seq"]).cast("long").alias("_change_ordinal"),
                )
            )
        if not parts:
            base_df = self.read(name, snapshot_id=to_sid).limit(0)
            return base_df.select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(0).cast("long").alias("_change_ordinal"),
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return self._align_changes(out, man_to)

    def _align_changes(self, df: DataFrame, man: dict) -> DataFrame:
        """_align, but preserving the _change_type/_change_ordinal
        metadata columns at the end."""
        meta = ["_change_type", "_change_ordinal"]
        if not man.get("schema_json"):
            return df
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        target = StructType.fromJson(json.loads(man["schema_json"]))
        for f in target.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df.select(*[f.name for f in target.fields], *meta)

    # ---------- writes ----------
    def overwrite(
        self, df: DataFrame, name: str,
        partition_by: list[str] | None = None,
        branch: str | None = None,
        summary: dict | None = None,
    ) -> int:
        """Overwrite as a new snapshot; an explicit ``partition_by``
        (re)defines the table's hive-style partition layout (the Iceberg
        identity partition transform — new spec allowed here because
        overwrite replaces every data dir). ``branch=`` stages the
        overwrite on that branch (WAP) instead of main; ``summary``
        lands in the snapshot summary (commit metadata, e.g. the
        resumable-iteration round marker)."""
        pb = list(partition_by) if partition_by is not None else (
            self._parent_partition_by(name, None, branch=branch)
        )
        rel, n = self._write_new_dir(df, name, pb)
        sid = self._next_sid(name)
        return self._commit(
            name, "overwrite", [rel], n, partition_by=pb,
            schema_json=df.schema.json(), branch=branch,
            summary=summary,
            extra={
                "dir_seqs": {rel: sid},
                "delete_files": [],
                "dir_specs": {rel: pb},
                "file_stats": {rel: self._collect_file_stats(name, rel)},
            },
        )

    def append(
        self,
        df: DataFrame,
        name: str,
        summary: dict | None = None,
        partition_by: list[str] | None = None,
        evolve_spec: bool = False,
        branch: str | None = None,
    ) -> int:
        """Append as a new snapshot. ``summary`` lands in the manifest's
        summary block — the hook streaming sinks use to record their
        micro-batch id for exactly-once commit dedup (Iceberg records
        ``spark.app.id``/epoch the same way). Partition spec is inherited
        from the parent snapshot; passing a different one raises unless
        ``evolve_spec=True`` (Iceberg partition-spec evolution: old dirs
        keep their layout, the new spec applies to this and future
        writes; reads scan each dir under the spec it was written
        with). With ``branch=`` the commit's parent is the branch head
        and only the branch pointer advances — the WAP staging write
        (Iceberg ``spark.wap.branch``); main readers are unaffected
        until ``fast_forward``."""
        pb = self._parent_partition_by(name, partition_by, evolve_spec, branch)
        rel, n = self._write_new_dir(df, name, pb)
        parent = self._ref_head(name, branch)
        pman = self._load_manifest(name, parent) if parent else {}
        dirs = pman.get("data_dirs", [])
        seqs = dict(pman.get("dir_seqs") or {})
        seqs[rel] = self._next_sid(name)
        dspecs = dict(pman.get("dir_specs") or {})
        if pman and "dir_specs" not in pman:
            # legacy manifests: every parent dir used the parent spec
            for d in dirs:
                dspecs[d] = pman.get("partition_by", [])
        dspecs[rel] = pb
        return self._commit(
            name, "append", dirs + [rel], n, summary, partition_by=pb,
            schema_json=self._evolved_schema_json(name, df, branch),
            branch=branch,
            extra={
                "dir_seqs": seqs,
                "delete_files": pman.get("delete_files") or [],
                "dir_specs": dspecs,
                "file_stats": {
                    **(pman.get("file_stats") or {}),
                    rel: self._collect_file_stats(name, rel),
                },
            },
        )

    def committed_summaries(self, name: str, key: str) -> set:
        """All values of a summary field across retained snapshots —
        O(snapshots) driver-side JSON, never touches data."""
        return {
            m["summary"][key]
            for m in self.history(name)
            if key in m["summary"]
        }

    def merge_upsert(self, df: DataFrame, name: str, keys: list[str]) -> int:
        """Copy-on-write MERGE: incoming rows replace same-key rows
        (ties and idempotence semantics identical to
        ``Catalog.merge_upsert``). Reads the parent snapshot while
        writing the child — safe because data files are immutable; no
        scratch-swap needed, and the pre-merge state stays time-travel
        readable until expiry."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        others = [c for c in df.columns if c not in keys]
        incoming = df.withColumn("__src", F.lit(1))
        if self.exists(name):
            merged = (
                self.read(name).withColumn("__src", F.lit(0))
                .unionByName(incoming, allowMissingColumns=True)
            )
        else:
            merged = incoming
        w = Window.partitionBy(*keys).orderBy(
            F.desc("__src"), *[F.desc(c) for c in others]
        )
        merged = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__src")
        )
        pb = self._parent_partition_by(name, None)
        rel, n = self._write_new_dir(merged, name, pb)
        sid = (self.current_snapshot_id(name) or 0) + 1
        return self._commit(
            name, "merge", [rel], n, partition_by=pb,
            schema_json=merged.schema.json(),
            extra={
                "dir_seqs": {rel: sid},
                "delete_files": [],
                "dir_specs": {rel: pb},
                "file_stats": {rel: self._collect_file_stats(name, rel)},
            },
        )

    def delete_keys(
        self, keys_df: DataFrame, name: str, keys: list[str]
    ) -> int:
        """Merge-on-read DELETE (Iceberg v2 equality-delete file): write
        the key rows as a tombstone file and commit — the data files are
        NOT rewritten. Reads anti-join each data dir against the delete
        files sequenced after it; ``compact`` later folds the deletes in
        and drops them. This is the CDC-ingest shape: at 10^12 docs a
        takedown/expiry batch touches tombstone-sized data instead of
        rewriting the corpus, and re-appending a deleted key AFTER the
        delete makes it visible again (sequence-number semantics)."""
        sid = self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        cols = set(keys_df.columns)
        missing = [k for k in keys if k not in cols]
        if missing:
            raise ValueError(f"delete keys {missing} not in keys_df")
        tomb = keys_df.select(*keys).distinct()
        rel, n = self._write_new_dir(
            tomb, name, root=self._delete_dir(name)
        )
        dels = list(man.get("delete_files") or [])
        dels.append({"dir": rel, "seq": sid + 1, "keys": list(keys)})
        return self._commit(
            name, "delete", man["data_dirs"], 0,
            summary={"added_delete_files": n},
            partition_by=man.get("partition_by", []),
            schema_json=man.get("schema_json"),
            extra={
                "dir_seqs": man.get("dir_seqs") or {},
                "delete_files": dels,
                "dir_specs": man.get("dir_specs")
                or {d: man.get("partition_by", []) for d in man["data_dirs"]},
                "file_stats": man.get("file_stats") or {},
            },
        )

    def delete_where(
        self, name: str, predicate: str, equality_keys: list[str]
    ) -> int:
        """``DELETE FROM name WHERE predicate`` in merge-on-read mode:
        resolve the matching rows' equality keys from the current
        snapshot (one filtered scan), then commit them as an
        equality-delete file via ``delete_keys``."""
        keys_df = self.read(name).where(predicate).select(*equality_keys)
        return self.delete_keys(keys_df, name, equality_keys)

    def delete_positions(self, name: str, predicate: str) -> int:
        """Merge-on-read DELETE as an Iceberg v2 POSITION-delete file:
        resolve the matching rows of the CURRENT snapshot to their
        physical addresses (file path + row index, from Spark's
        ``_metadata`` struct — zero extra I/O on the scan) and commit
        the address list as a tombstone; data files are NOT rewritten.

        Complements ``delete_keys``/``delete_where``: an equality
        delete needs a key and kills EVERY row with that key (past and,
        per sequence semantics, until re-append); a position delete
        needs no key at all, kills exactly the rows that matched —
        duplicates of an identical row elsewhere survive — and can
        never collide with later appends (new files have new paths).
        This is the shape query engines write for row-level DELETE on
        keyless tables, and what fine-grained takedown of specific
        physical rows uses at 10^12-doc scale. Reads anti-join each
        data dir against the positional tombstones sequenced after it
        (broadcast-sized, like equality tombstones); ``compact`` folds
        them in and clears them; ``read_changes`` emits the full
        deleted rows (it re-reads them BY ADDRESS)."""
        sid = self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        dels, groups = self._delete_plan(man)
        tomb = None
        for applicable, dirs in sorted(groups.items()):
            sub = self._scan(name, {**man, "data_dirs": dirs}, with_pos=True)
            sub = self._apply_deletes(
                sub, name, [dels[i] for i in applicable]
            )
            part = sub.where(predicate).select("_pos_fp", "_pos_idx")
            tomb = part if tomb is None else tomb.unionByName(part)
        if tomb is None:
            raise ValueError(
                f"delete_positions('{name}'): table has no data dirs"
            )
        tomb = tomb.distinct()
        rel, n = self._write_new_dir(tomb, name, root=self._delete_dir(name))
        new_dels = list(man.get("delete_files") or [])
        new_dels.append({"dir": rel, "seq": sid + 1, "positional": True})
        return self._commit(
            name, "delete", man["data_dirs"], 0,
            summary={"added_position_delete_files": n},
            partition_by=man.get("partition_by", []),
            schema_json=man.get("schema_json"),
            extra={
                "dir_seqs": man.get("dir_seqs") or {},
                "delete_files": new_dels,
                "dir_specs": man.get("dir_specs")
                or {d: man.get("partition_by", []) for d in man["data_dirs"]},
                "file_stats": man.get("file_stats") or {},
            },
        )

    def update_where(
        self,
        name: str,
        col: str,
        lo,
        hi,
        set_exprs: dict[str, str],
    ) -> dict:
        """Copy-on-write ``UPDATE name SET ... WHERE col BETWEEN lo AND
        hi`` (Iceberg CoW UPDATE / ``rewrite_data_files`` of matching
        files): manifest stats prune the rewrite to the data dirs whose
        file [min, max] can intersect the range — every other dir is
        carried into the new snapshot UNTOUCHED (same bytes, same stats,
        same delete-sequence), which on a sort-clustered 100 TB table
        makes an update of one key range rewrite O(matching dirs), not
        the corpus. Touched dirs are read in full (pruning within a dir
        is planning detail; non-matching rows must survive) with their
        applicable merge-on-read deletes FOLDED IN — the rewritten dir
        gets a fresh sequence number, so older tombstones correctly stop
        applying to it while still applying to the untouched dirs.
        ``set_exprs`` maps column -> SQL expression evaluated on the
        matching rows (non-matching rows pass through bit-identically).
        History stays append-only: readers of prior snapshots keep their
        planned files, and ``read_incremental`` across an update refuses
        (dir replacement breaks the append-only guard) rather than
        re-reporting rewritten rows as new."""
        from pyspark.sql import functions as F

        sid = self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        man = self._load_manifest(name, sid)
        schema_cols = set(self.read(name, snapshot_id=sid).columns)
        bad = [c for c in set_exprs if c not in schema_cols]
        if bad:
            raise ValueError(f"update_where('{name}'): unknown columns {bad}")
        plan = self.plan_files(name, col, lo, hi, snapshot_id=sid)
        touched = [d for d in man["data_dirs"] if plan["files"].get(d)]
        if not touched:
            return {
                "snapshot_id": sid,
                "dirs_rewritten": 0,
                "dirs_kept": len(man["data_dirs"]),
                "rows_updated": 0,
            }
        rows_updated = self.read_where(
            name, col, lo, hi, snapshot_id=sid
        ).count()
        dels, _groups = self._delete_plan(man)
        seqs = dict(man.get("dir_seqs") or {})
        specs = man.get("dir_specs") or {}
        default_spec = man.get("partition_by") or []
        stats = dict(man.get("file_stats") or {})
        if lo is None and hi is None:
            pred = F.lit(True)
        elif lo is None:
            pred = F.col(col) <= F.lit(hi)
        elif hi is None:
            pred = F.col(col) >= F.lit(lo)
        else:
            pred = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        new_dirs: list[str] = []
        new_seq = sid + 1
        for d in touched:
            spec = specs.get(d, default_spec)
            dpath = os.path.join(self._data_dir(name), d)
            r = self.spark.read
            if spec:
                r = r.option("basePath", dpath)
            df = r.parquet(dpath)
            applicable = [
                e for e in dels if e["seq"] > seqs.get(d, 0)
            ]
            need_pos = any(e.get("positional") for e in applicable)
            if need_pos:
                df = df.select(
                    "*",
                    F.col("_metadata.file_path").alias("_pos_fp"),
                    F.col("_metadata.row_index").alias("_pos_idx"),
                )
            df = self._align(df, man)
            df = self._apply_deletes(df, name, applicable)
            if need_pos:
                df = df.drop("_pos_fp", "_pos_idx")
            for c, expr in set_exprs.items():
                df = df.withColumn(
                    c, F.when(pred, F.expr(expr)).otherwise(F.col(c))
                )
            rel, _n = self._write_new_dir(df, name, spec or None)
            new_dirs.append(rel)
            seqs.pop(d, None)
            seqs[rel] = new_seq
            stats.pop(d, None)
            stats[rel] = self._collect_file_stats(name, rel)
        kept = [d for d in man["data_dirs"] if d not in touched]
        dir_specs = {
            d: specs.get(d, default_spec) for d in kept
        }
        for rel, d in zip(new_dirs, touched):
            dir_specs[rel] = specs.get(d, default_spec)
        new_sid = self._commit(
            name, "update", kept + new_dirs, 0,
            summary={
                "updated_range": [col, lo, hi],
                "set_columns": sorted(set_exprs),
                "rows_updated": rows_updated,
                "dirs_rewritten": len(touched),
                "dirs_kept": len(kept),
            },
            partition_by=man.get("partition_by", []),
            schema_json=man.get("schema_json"),
            extra={
                "dir_seqs": seqs,
                "delete_files": man.get("delete_files") or [],
                "dir_specs": dir_specs,
                "file_stats": stats,
            },
        )
        return {
            "snapshot_id": new_sid,
            "dirs_rewritten": len(touched),
            "dirs_kept": len(kept),
            "rows_updated": rows_updated,
        }

    def rollback(self, name: str, snapshot_id: int) -> int:
        """Restore an old snapshot's state as a NEW snapshot (history is
        append-only; nothing is deleted)."""
        man = self._load_manifest(name, snapshot_id)
        return self._commit(
            name, f"rollback-to-{snapshot_id}", man["data_dirs"], 0,
            partition_by=man.get("partition_by", []),
            extra={
                "dir_seqs": man.get("dir_seqs") or {},
                "delete_files": man.get("delete_files") or [],
                "dir_specs": man.get("dir_specs")
                or {d: man.get("partition_by", []) for d in man["data_dirs"]},
                "file_stats": man.get("file_stats") or {},
            },
        )

    # ---------- maintenance ----------
    def compact(
        self, name: str, target_files: int = 1,
        sort_by: list[str] | None = None,
    ) -> dict:
        """Small-file compaction (Iceberg ``rewrite_data_files``): rewrite
        the current snapshot's row set into one fresh data dir with
        ``target_files`` parquet files and commit it as a ``replace``
        snapshot. Every append leaves its own dir behind; after a few
        thousand micro-batches the scan plans thousands of splits of a
        few KB each — at 10¹² docs this is the canonical Iceberg
        maintenance job, run on a schedule, and it MUST be a new snapshot
        (never an in-place rewrite) so concurrent readers keep their
        planned files and time travel still sees the fragmented history
        until expiry. Partitioned tables repartition on the partition
        columns so each hive dir collapses to one file; ``replace`` is
        data-neutral, so ``read_incremental`` across it refuses (by the
        same append-only guard) instead of re-reporting rewritten rows
        as new.

        ``sort_by`` makes it Iceberg's sort-order rewrite
        (``rewrite_data_files(strategy => 'sort')``): unpartitioned
        tables are range-partitioned on the keys then sorted within
        each file, so files cover DISJOINT key ranges and min/max
        footer pruning skips whole files; partitioned tables sort
        within each hive dir's file (ranges are already split by the
        partition column)."""
        sid = self.current_snapshot_id(name)
        if sid is None:
            raise ValueError(f"unknown table '{name}'")
        if target_files < 1:
            raise ValueError("target_files must be >= 1")
        man = self._load_manifest(name, sid)
        dd = self._data_dir(name)
        files_before = sum(
            1
            for d in man["data_dirs"]
            for _, _, fs in os.walk(os.path.join(dd, d))
            for f in fs
            if f.endswith(".parquet")
        )
        cur = self.read(name, snapshot_id=sid)  # applies delete files
        pb = man.get("partition_by", [])
        if pb:
            cur = cur.repartition(target_files, *pb)
            if sort_by:
                cur = cur.sortWithinPartitions(*pb, *sort_by)
        elif sort_by:
            cur = cur.repartitionByRange(
                target_files, *sort_by
            ).sortWithinPartitions(*sort_by)
        else:
            cur = cur.repartition(target_files)
        rel, n = self._write_new_dir(cur, name, pb)
        new_sid = self._commit(
            name, "replace", [rel], n,
            summary={
                "compacted_from": sid,
                "files_before": files_before,
                "sort_by": list(sort_by or []),
                "applied_delete_files": len(man.get("delete_files") or []),
            },
            partition_by=pb, schema_json=man.get("schema_json"),
            extra={
                "dir_seqs": {rel: sid + 1},
                "delete_files": [],
                "dir_specs": {rel: pb},
                "file_stats": {rel: self._collect_file_stats(name, rel)},
            },
        )
        return {
            "snapshot_id": new_sid,
            "dirs_before": len(man["data_dirs"]),
            "files_before": files_before,
            "files_after": n,
        }

    def remove_orphan_files(
        self, name: str, older_than_s: float = 3 * 24 * 3600,
        dry_run: bool = False,
    ) -> dict:
        """Iceberg ``remove_orphan_files``: delete data/tombstone dirs
        on disk that NO retained manifest references — the litter of
        writer jobs that died between materializing their dir and
        committing the manifest (the commit protocol makes such dirs
        unreachable by construction, so they leak until this runs).
        ``older_than_s`` guards in-flight writers: a dir younger than
        the cutoff may belong to a commit that hasn't landed yet, so it
        is skipped (Iceberg's ``older_than`` has the same purpose)."""
        hist = self.history(name)
        if not hist:
            raise ValueError(f"unknown table '{name}'")
        live = {d for m in hist for d in m["data_dirs"]}
        live_del = {
            e["dir"] for m in hist for e in m.get("delete_files") or []
        }
        now = time.time()
        removed, skipped_young = [], 0
        for root, refd in (
            (self._data_dir(name), live),
            (self._delete_dir(name), live_del),
        ):
            for d in sorted(os.listdir(root)) if os.path.isdir(root) else []:
                p = os.path.join(root, d)
                if d in refd:
                    continue
                if now - os.path.getmtime(p) < older_than_s:
                    skipped_young += 1
                    continue
                if not dry_run:
                    shutil.rmtree(p)
                removed.append(d)
        return {
            "orphans_removed": removed,
            "skipped_young": skipped_young,
            "dry_run": dry_run,
        }

    def expire_snapshots(self, name: str, keep_last: int = 1) -> dict:
        """Garbage-collect: drop all but the newest ``keep_last``
        manifests and delete data dirs no retained snapshot references
        (Iceberg ``expire_snapshots``). Tagged snapshots, branch heads
        and the main head are pinned — their manifests and data survive
        regardless of ``keep_last``. Time travel to an expired snapshot
        then raises a clear error."""
        hist = self.history(name)
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        pinned = set(self.refs(name).values())
        pinned |= set(self.branches(name).values())
        cur = self.current_snapshot_id(name)
        if cur is not None:
            pinned.add(cur)
        keep = hist[-keep_last:] + [
            m for m in hist[:-keep_last] if m["snapshot_id"] in pinned
        ]
        drop = [
            m
            for m in hist[:-keep_last]
            if m["snapshot_id"] not in pinned
        ]
        live = {d for m in keep for d in m["data_dirs"]}
        removed_dirs = 0
        dd = self._data_dir(name)
        for d in (os.listdir(dd) if os.path.isdir(dd) else []):
            if d not in live:
                shutil.rmtree(os.path.join(dd, d))
                removed_dirs += 1
        live_del = {
            e["dir"] for m in keep for e in m.get("delete_files") or []
        }
        ddel = self._delete_dir(name)
        for d in (os.listdir(ddel) if os.path.isdir(ddel) else []):
            if d not in live_del:
                shutil.rmtree(os.path.join(ddel, d))
                removed_dirs += 1
        for m in drop:
            os.remove(self._manifest_path(name, m["snapshot_id"]))
        return {
            "expired_snapshots": len(drop),
            "removed_data_dirs": removed_dirs,
            "retained_snapshots": len(keep),
        }

    # ---------- metadata tables (Iceberg SELECT * FROM t.snapshots) ----------
    def inspect(self, name: str, kind: str) -> DataFrame:
        """Queryable metadata tables — Iceberg's ``t.snapshots`` /
        ``t.files`` / ``t.refs`` / ``t.partitions``. Built driver-side
        from the manifests (metadata is O(snapshots) tiny JSON by
        design; no data file is opened) and returned as a DataFrame so
        table-health dashboards join/filter them like any other table:
        small-file counts per partition feed ``compact`` decisions,
        snapshot cadence feeds ``expire_snapshots`` policy."""
        from pyspark.sql.types import (
            ArrayType, DoubleType, IntegerType, LongType, StringType,
            StructField, StructType,
        )

        if not self.history(name):
            raise ValueError(f"unknown table '{name}'")
        if kind == "snapshots":
            rows = [
                (
                    m["snapshot_id"], m.get("parent_id"),
                    m.get("ref", "main"), m["operation"],
                    float(m["timestamp"]), len(m["data_dirs"]),
                    int(m["summary"].get("added_data_files", 0)),
                    len(m.get("delete_files") or []),
                )
                for m in self.history(name)
            ]
            schema = StructType([
                StructField("snapshot_id", LongType(), False),
                StructField("parent_id", LongType(), True),
                StructField("ref", StringType(), False),
                StructField("operation", StringType(), False),
                StructField("committed_at", DoubleType(), False),
                StructField("n_data_dirs", IntegerType(), False),
                StructField("added_data_files", IntegerType(), False),
                StructField("n_delete_files", IntegerType(), False),
            ])
        elif kind == "files":
            man = self._load_manifest(
                name, self.current_snapshot_id(name)
            )
            seqs = man.get("dir_seqs") or {}
            specs = man.get("dir_specs") or {}
            stats = man.get("file_stats") or {}
            rows = []
            for d in man["data_dirs"]:
                full = os.path.join(self._data_dir(name), d)
                fstats = stats.get(d) or {}
                files = sorted(
                    os.path.relpath(os.path.join(r, f), full)
                    for r, _, fs in os.walk(full)
                    for f in fs
                    if f.endswith(".parquet")
                )
                for fp in files:
                    rows.append((
                        d, fp, int(seqs.get(d, 0)),
                        list(specs.get(d, man.get("partition_by", []))),
                        json.dumps(fstats.get(fp), sort_keys=True)
                        if fstats.get(fp) else None,
                    ))
            schema = StructType([
                StructField("data_dir", StringType(), False),
                StructField("file_path", StringType(), False),
                StructField("sequence_number", LongType(), False),
                StructField("spec", ArrayType(StringType()), False),
                StructField("bounds_json", StringType(), True),
            ])
        elif kind == "refs":
            cur = self.current_snapshot_id(name)
            rows = [("main", "branch", cur)]
            rows += [
                (t, "tag", sid) for t, sid in sorted(self.refs(name).items())
            ]
            rows += [
                (b, "branch", sid)
                for b, sid in sorted(self.branches(name).items())
            ]
            schema = StructType([
                StructField("ref_name", StringType(), False),
                StructField("ref_type", StringType(), False),
                StructField("snapshot_id", LongType(), False),
            ])
        elif kind == "partitions":
            man = self._load_manifest(name, self.current_snapshot_id(name))
            specs = man.get("dir_specs") or {}
            rows = []
            for d in man["data_dirs"]:
                full = os.path.join(self._data_dir(name), d)
                spec = specs.get(d, man.get("partition_by", []))
                for r, _, fs in os.walk(full):
                    n = sum(1 for f in fs if f.endswith(".parquet"))
                    if not n:
                        continue
                    part = os.path.relpath(r, full)
                    rows.append((
                        None if part == "." else part, d, len(spec), n,
                    ))
            schema = StructType([
                StructField("partition", StringType(), True),
                StructField("data_dir", StringType(), False),
                StructField("spec_len", IntegerType(), False),
                StructField("n_files", IntegerType(), False),
            ])
        else:
            raise ValueError(
                f"unknown metadata table '{kind}'; one of: "
                "snapshots, files, refs, partitions"
            )
        return self.spark.createDataFrame(rows, schema)
