"""Per-sequence metrics table → CSV (reference: metrics/save_utils.py).

Keeps the reference's CSV contract byte-compatible: columns are the metric
strings from the config, one row per sequence, plus a skipna "Average" row,
floats formatted %.5f, re-exported after every clip.  Adds resume support:
a results CSV can be reloaded so already-scored sequences are skipped
(SURVEY.md §5 "cheap elasticity appropriate to an eval framework").
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


class MetricsManager:
    def __init__(self, metric_names: List[str], sequence_names: Optional[List[str]] = None):
        self.metric_names = list(metric_names)
        self.sequence_names: List[str] = list(sequence_names or [])
        self.metrics_df = pd.DataFrame(columns=self.metric_names, dtype=float)

    def update_metrics(self, metrics_dict: Dict[str, float]) -> None:
        seq_name = metrics_dict.get("seq_name")
        if seq_name is None:
            raise ValueError("metrics dict must contain 'seq_name'")
        if seq_name not in self.sequence_names:
            self.sequence_names.append(seq_name)
            self.metrics_df.loc[seq_name] = [np.nan] * len(self.metric_names)
        for metric in self.metric_names:
            if metric in metrics_dict:
                self.metrics_df.at[seq_name, metric] = float(metrics_dict[metric])

    def calculate_averages(self) -> Dict[str, float]:
        return {
            m: self.metrics_df[m].mean(skipna=True) for m in self.metric_names
        }

    def export_to_csv(self, filepath: str) -> None:
        if not self.sequence_names:
            return
        export_df = self.metrics_df.copy()
        export_df.loc["Average"] = pd.Series(self.calculate_averages())
        dirname = os.path.dirname(filepath)
        if dirname:
            os.makedirs(dirname, exist_ok=True)
        # atomic replace: the CSV is rewritten after EVERY clip (reference
        # eval.py:99) and doubles as the resume journal — a crash mid-write
        # must never leave a torn file for from_csv to reload
        tmp = filepath + ".tmp"
        export_df.to_csv(tmp, float_format="%.5f")
        os.replace(tmp, filepath)

    # ------------------------------------------------------------------
    # resume support (not in the reference)
    # ------------------------------------------------------------------

    @classmethod
    def from_csv(cls, filepath: str, metric_names: List[str]) -> "MetricsManager":
        """Reload a previously exported CSV to resume an interrupted eval."""
        mgr = cls(metric_names)
        if os.path.isfile(filepath):
            df = pd.read_csv(filepath, index_col=0)
            df = df[df.index != "Average"]
            for seq_name, row in df.iterrows():
                rec = {"seq_name": seq_name}
                rec.update({k: v for k, v in row.items() if k in metric_names})
                mgr.update_metrics(rec)
        return mgr

    def has_sequence(self, seq_name: str) -> bool:
        return seq_name in self.sequence_names

    def rows(self) -> List[Dict[str, float]]:
        """Per-sequence rows as JSON-serializable dicts (multi-host gather;
        NaN metrics omitted so update_metrics round-trips)."""
        out = []
        for seq in self.sequence_names:
            row: Dict[str, float] = {"seq_name": seq}
            for m in self.metric_names:
                v = self.metrics_df.at[seq, m]
                if not pd.isna(v):
                    row[m] = float(v)
            out.append(row)
        return out
