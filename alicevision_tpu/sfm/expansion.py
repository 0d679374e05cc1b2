"""Modular incremental engine: the bootstrap / expansion decomposition.

TPU-native counterpart of the reference's v3.3 modular incremental SfM
(ref: src/aliceVision/sfm/pipeline/expanding/ExpansionProcess.hpp:20-31 ->
ExpansionIteration -> ExpansionChunk.hpp:18, pluggable ExpansionPolicy
(ExpansionPolicyLegacy.hpp:15), SfmResection / SfmTriangulation / SfmBundle
units; driven by main_tracksBuilding / main_sfmBootstraping /
main_sfmExpanding, main_sfmExpanding.cpp:206-211). The same batched
primitives as IncrementalSfM, exposed as separable, externally-drivable
steps with checkpointable state between them.
"""

from __future__ import annotations

import numpy as np

from .incremental import IncrementalConfig, IncrementalSfM


class ExpansionPolicyLegacy:
    """View-selection policy: score = observations of valid landmarks,
    relative-threshold grouping (ExpansionPolicyLegacy semantics)."""

    def __init__(self, rel_threshold: float = 0.75, chunk_cap: int = 30):
        self.rel_threshold = rel_threshold
        self.chunk_cap = chunk_cap

    def select(self, engine: IncrementalSfM) -> list:
        scores = engine.view_scores()
        best = scores.max()
        if best < engine.cfg.min_track_inliers_resection:
            return []
        n_posed = int(engine.res.posed.sum())
        cap = 1 if n_posed < 4 else self.chunk_cap
        cands = np.argsort(-scores)
        return [int(v) for v in cands if scores[v] >= self.rel_threshold * best][:cap]


class ExpansionChunk:
    """One chunk: resect the selected views, triangulate, bundle, filter
    (ExpansionChunk::process)."""

    def __init__(self, engine: IncrementalSfM):
        self.engine = engine

    def process(self, views: list) -> int:
        e = self.engine
        added = [v for v in views if e.resect_view(v)]
        if not added:
            return 0
        e.triangulate_all()
        e.bundle_adjust(new_views=added)
        for _ in range(5):
            if e.remove_outliers() == 0:
                break
            e.triangulate_all()
            e.bundle_adjust(new_views=added)
        return len(added)


class ExpansionIteration:
    """One iteration: policy selects a chunk, the chunk processes it."""

    def __init__(self, engine: IncrementalSfM, policy=None):
        self.engine = engine
        self.policy = policy or ExpansionPolicyLegacy()
        self.chunk = ExpansionChunk(engine)

    def process(self) -> int:
        views = self.policy.select(self.engine)
        if not views:
            return 0
        return self.chunk.process(views)


class ExpansionProcess:
    """Drives iterations until exhaustion (ExpansionProcess::process).

    Supports the reference's "SfM augmentation" behavior: if the engine
    already has posed views (e.g. restored from a checkpoint), bootstrap is
    skipped and expansion continues from the existing scene
    (ReconstructionEngine_sequentialSfM.cpp:183-223)."""

    def __init__(self, engine: IncrementalSfM, policy=None, max_iterations=1000):
        self.engine = engine
        self.iteration = ExpansionIteration(engine, policy)
        self.max_iterations = max_iterations

    def bootstrap(self) -> bool:
        if self.engine.res.posed.any():
            return True  # augmentation mode — scene already initialized
        if not self.engine.initialize():
            return False
        self.engine.triangulate_all()
        self.engine.bundle_adjust()
        self.engine.remove_outliers()
        self.engine.triangulate_all()
        return True

    def process(self):
        if not self.bootstrap():
            raise RuntimeError("bootstrap failed: no valid initial pair")
        for _ in range(self.max_iterations):
            if self.iteration.process() == 0:
                break
        return self.engine.res
