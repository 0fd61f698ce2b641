"""Dataset over loose .osu / .osz files (no parquet metadata).

Synthesizes the MMRS metadata row schema from a minimal .osu key-value scan
so the same downstream pipeline works on raw user files. Parity target:
``/root/reference/utils/beatmap_files_dataset.py`` (with a robustness fix:
metadata derivation tolerates the columns a loose file can't provide, where
the reference would crash interpolating a missing StarRating array).
"""
from __future__ import annotations

import logging
import tempfile
import zipfile
from pathlib import Path
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pandas import DataFrame, Series

from ..processing.processor import CM3PProcessor
from ..beatmap.parser import load_beatmap

logger = logging.getLogger(__name__)

REQUIRED_COLUMNS = [
    "Id", "Artist", "ArtistUnicode", "Creator", "FavouriteCount", "BeatmapSetId", "Nsfw", "Offset",
    "BeatmapSetPlayCount", "Source", "BeatmapSetStatus", "Spotlight", "Title", "TitleUnicode",
    "BeatmapSetUserId", "Video", "Description", "GenreId", "GenreName", "LanguageId", "LanguageName",
    "PackTags", "Ratings", "DownloadDisabled", "BeatmapSetBpm", "CanBeHyped", "DiscussionLocked",
    "BeatmapSetIsScoreable", "BeatmapSetLastUpdated", "BeatmapSetRanked", "RankedDate", "Storyboard",
    "SubmittedDate", "Tags", "DifficultyRating", "Mode", "Status", "TotalLength", "UserId", "Version",
    "Checksum", "MaxCombo", "Accuracy", "Ar", "Bpm", "CountCircles", "CountSliders", "CountSpinners",
    "Cs", "Drain", "HitLength", "IsScoreable", "LastUpdated", "ModeInt", "PassCount", "PlayCount",
    "Ranked", "Owners", "TopTagIds", "TopTagCounts", "StarRating", "OmdbTags", "AudioFile",
    "BeatmapSetFolder", "BeatmapFile",
]


def _collect_paths(paths: list[str]) -> list[Path]:
    collected: list[Path] = []
    for p in paths:
        pth = Path(p)
        if pth.is_file():
            if pth.suffix.lower() in {".osu", ".osz"}:
                collected.append(pth)
        elif pth.is_dir():
            for fp in sorted(pth.rglob("*")):
                if fp.is_file() and fp.suffix.lower() in {".osu", ".osz"}:
                    collected.append(fp)
    return collected


def _extract_osz(osz_path: Path, extract_root: Path) -> Path:
    target_dir = extract_root / osz_path.stem
    if target_dir.exists():
        return target_dir
    target_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(osz_path, "r") as zf:
        zf.extractall(target_dir)
    return target_dir


def _parse_osu_file(osu_path: Path) -> dict:
    """Synthesize one metadata row from a .osu file via the real parser."""
    data: dict = {col: pd.NA for col in REQUIRED_COLUMNS}
    data["BeatmapSetFolder"] = osu_path.parent.name
    data["BeatmapFile"] = osu_path.name
    data["Path"] = str(osu_path.parent.parent)

    try:
        bm = load_beatmap(osu_path)
    except Exception:
        return data

    data["AudioFile"] = bm.audio_filename or pd.NA
    data["Title"] = bm.title or pd.NA
    data["Artist"] = bm.artist or pd.NA
    data["Creator"] = bm.creator or pd.NA
    data["Version"] = bm.version or pd.NA
    data["Id"] = bm.beatmap_id if bm.beatmap_id is not None else pd.NA
    data["BeatmapSetId"] = bm.beatmap_set_id if bm.beatmap_set_id is not None else pd.NA
    data["Cs"] = bm.circle_size
    data["Ar"] = bm.approach_rate
    data["Drain"] = bm.hp_drain_rate
    data["ModeInt"] = bm.mode
    data["Tags"] = " ".join(bm.tags) if bm.tags else pd.NA

    bpm = pd.NA
    for tp in bm.timing_points:
        if tp.bpm:
            bpm = tp.bpm
            break
    data["Bpm"] = bpm

    objs = bm.hit_objects()
    if objs:
        times = [o.time for o in objs]
        data["TotalLength"] = float((max(times) - min(times)) / 1000.0)
        data["HitLength"] = data["TotalLength"]
        from ..beatmap.osu import Circle, Slider, Spinner

        data["CountCircles"] = sum(isinstance(o, Circle) for o in objs)
        data["CountSliders"] = sum(isinstance(o, Slider) for o in objs)
        data["CountSpinners"] = sum(isinstance(o, Spinner) for o in objs)
    else:
        data["TotalLength"] = 0.0
        data["HitLength"] = 0.0
        data["CountCircles"] = data["CountSliders"] = data["CountSpinners"] = 0
    return data


def build_metadata_dataframe(paths: list[str], extract_root: Path) -> DataFrame:
    files = _collect_paths(paths)
    extract_root.mkdir(exist_ok=True)

    rows: list[dict] = []
    for p in files:
        if p.suffix.lower() == ".osu":
            rows.append(_parse_osu_file(p))
        elif p.suffix.lower() == ".osz":
            folder = _extract_osz(p, extract_root)
            for osu in sorted(folder.rglob("*.osu")):
                rows.append(_parse_osu_file(osu))
    df = pd.DataFrame(rows)
    # files without embedded ids get synthetic, stable negative ids
    if "Id" in df.columns:
        missing = df["Id"].isna()
        df.loc[missing, "Id"] = -(np.arange(int(missing.sum())) + 1)
        df["Id"] = df["Id"].astype("int64")
    if "BeatmapSetId" in df.columns:
        missing = df["BeatmapSetId"].isna()
        df.loc[missing, "BeatmapSetId"] = -(np.arange(int(missing.sum())) + 1)
        df["BeatmapSetId"] = df["BeatmapSetId"].astype("int64")
    df.set_index(["BeatmapSetId", "Id"], inplace=True)
    df.sort_index(inplace=True)
    return df


def _safe_row_metadata(row: Series, speed: float = 1.0) -> Optional[dict]:
    """get_metadata for a synthesized row: tolerate missing columns."""
    meta: dict = {}
    sr = row.get("StarRating", None)
    if isinstance(sr, (list, np.ndarray)) and len(sr) == 7:
        meta["difficulty"] = float(np.interp(speed, [0.5, 0.75, 1.0, 1.25, 1.5, 1.75, 2.0], sr))
    elif pd.notna(row.get("DifficultyRating", pd.NA)):
        meta["difficulty"] = float(row["DifficultyRating"])
    submitted = row.get("SubmittedDate", pd.NA)
    if pd.notna(submitted) and hasattr(submitted, "year"):
        meta["year"] = submitted.year
    if pd.notna(row.get("ModeInt", pd.NA)):
        meta["mode"] = int(row["ModeInt"])
    if pd.notna(row.get("Status", pd.NA)):
        meta["status"] = row["Status"]
    if pd.notna(row.get("UserId", pd.NA)):
        meta["mapper"] = row["UserId"]
    tags = row.get("TopTagIds", None)
    if isinstance(tags, (list, np.ndarray)) and len(tags) > 0:
        meta["tags"] = list(tags)
    return meta or None


class BeatmapFilesDataset:
    """Iterate loose beatmap files through the processor."""

    def __init__(
        self,
        beatmap_paths: list[str],
        processor: CM3PProcessor,
        sampling_rate: int = 16000,
        include_audio: bool = True,
        include_beatmap: bool = True,
        include_metadata: bool = True,
        worker_id: int = 0,
        num_workers: int = 1,
    ):
        self.beatmap_paths = beatmap_paths
        self._tmpdir = tempfile.TemporaryDirectory(prefix="cm3p_osz_")
        self._extract_root = Path(self._tmpdir.name)
        self.metadata = build_metadata_dataframe(beatmap_paths, self._extract_root)
        self.processor = processor
        self.sampling_rate = sampling_rate
        self.include_audio = include_audio
        self.include_beatmap = include_beatmap
        self.include_metadata = include_metadata
        self.worker_id = worker_id
        self.num_workers = num_workers

    def __iter__(self) -> Iterator[dict]:
        metadata = self.metadata
        if self.num_workers > 1:
            metadata = metadata[self.worker_id :: self.num_workers]
        return self._iter(metadata)

    def __del__(self):
        try:
            if hasattr(self, "_tmpdir") and self._tmpdir is not None:
                self._tmpdir.cleanup()
        except Exception:
            pass

    def _iter(self, metadata: DataFrame) -> Iterator[dict]:
        for beatmapset_id in metadata.index.get_level_values(0).unique():
            subset = metadata.loc[[beatmapset_id]]
            first = subset.iloc[0]
            track_path = Path(first.get("Path", ".")) / str(first.get("BeatmapSetFolder", ""))

            audio_cache: dict = {}
            # audio-only window work (mel, token counts) shared across the
            # set's difficulties — see CM3PProcessor.audio_features_cache
            features_cache: dict = {}
            for idx, row in subset.iterrows():
                audio_samples = None
                audio_filename = row.get("AudioFile", None)
                if self.include_audio and pd.notna(audio_filename):
                    audio_path = track_path / str(audio_filename)
                    try:
                        if audio_path in audio_cache:
                            audio_samples = audio_cache[audio_path]
                        else:
                            from ..audio.loading import load_audio_file

                            audio_samples = load_audio_file(audio_path, self.sampling_rate, 1.0)
                            audio_cache[audio_path] = audio_samples
                    except Exception as e:
                        logger.warning("Failed to load audio file %s (%s); continuing without audio", audio_path, e)
                        audio_samples = None

                beatmap_path = track_path / str(row.get("BeatmapFile", ""))
                try:
                    results = self.processor(
                        metadata=_safe_row_metadata(row) if self.include_metadata else None,
                        beatmap=str(beatmap_path) if self.include_beatmap else None,
                        audio=audio_samples,
                        audio_sampling_rate=self.sampling_rate,
                        multiply_metadata=self.include_metadata,
                        populate_metadata=self.include_metadata,
                        padding="max_length",
                        audio_features_cache=features_cache,
                    )
                except Exception as e:
                    logger.warning("Failed to process beatmap: %s (%s)", beatmap_path, e)
                    continue

                for i in range(len(results["input_ids"])):
                    item = {k: results[k][i] for k in results}
                    item["beatmap_id"] = idx
                    yield item
