"""Zero-shot foundation-model forecast adapters (SURVEY §2.12 tail).

Reference parity: polars_ts/adapters/foundation_forecast.py —
ChronosForecaster (:80-190), TimesFMForecaster (:193-262),
MoiraiForecaster (:265-370), foundation_forecast dispatcher (:372-408).

The heavy models (torch + chronos / timesfm / uni2ts) are not in this
container, so each adapter is an import-guarded shell around the SAME
distributed inference plumbing as operators/deep.py: contexts are
stacked per bucket of series and the model is called ONCE per batch
(`deep.batch_forecast`). A custom ``predict_batch`` hook can replace
the pretrained pipeline — that is also how the plumbing stays testable
here. Where the stack is missing, construction succeeds (cheap,
surface-visible) and the first predict raises a clear ImportError.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from polars_ts_spark.operators.deep import batch_forecast
from polars_ts_spark.panel import ID, TARGET, TIME


class _FoundationAdapter:
    """Shared adapter shell: context_length window in, h steps out."""

    _STACK = "torch"  # overridden per adapter
    _MODEL_DOC = ""

    def __init__(self, model_name: str, context_length: int = 64,
                 predict_batch=None,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.model_name = model_name
        self.context_length = context_length
        self._hook = predict_batch
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def _load_hook(self, h: int):  # pragma: no cover - stacks absent in CI
        raise ImportError(
            f"{self._STACK} is required for {type(self).__name__} "
            f"({self._MODEL_DOC}); pass predict_batch= to plug a custom or "
            "stub model into the same distributed inference plumbing"
        )

    def predict(self, df: DataFrame, h: int = 12) -> DataFrame:
        hook = self._hook or self._load_hook(h)
        return batch_forecast(df, hook, self.context_length, h,
                              self.id_col, self.time_col, self.target_col)


class ChronosForecaster(_FoundationAdapter):
    """Amazon Chronos zero-shot adapter (foundation_forecast.py:80-190):
    sample-path median over the pipeline's probabilistic output."""

    _STACK = "torch + chronos"
    _MODEL_DOC = "e.g. amazon/chronos-t5-small"

    def __init__(self, model_name: str = "amazon/chronos-t5-small",
                 num_samples: int = 20, **kw):
        super().__init__(model_name, **kw)
        self.num_samples = num_samples

    def _load_hook(self, h: int):  # pragma: no cover - chronos absent
        try:
            import torch  # noqa: F401
            from chronos import ChronosPipeline
        except ImportError:
            return super()._load_hook(h)
        pipeline = ChronosPipeline.from_pretrained(self.model_name)

        def hook(contexts: np.ndarray) -> np.ndarray:
            import torch as _t
            samples = pipeline.predict(
                _t.tensor(contexts, dtype=_t.float32), h,
                num_samples=self.num_samples,
            )
            return np.median(samples.numpy(), axis=1)

        return hook


class TimesFMForecaster(_FoundationAdapter):
    """Google TimesFM zero-shot adapter (foundation_forecast.py:193-262):
    decoder-only patch model; the loader builds a TimesFm with this
    adapter's context window and the hook forwards each stacked context
    batch through ``model.forecast`` (point head). Real weights are
    container-unavailable here — the loader is exercised via the hook
    contract test with a fake model."""

    _STACK = "timesfm"
    _MODEL_DOC = "e.g. google/timesfm-2.0-500m-pytorch"

    def __init__(self, model_name: str = "google/timesfm-2.0-500m-pytorch", **kw):
        super().__init__(model_name, **kw)

    def _load_hook(self, h: int):  # pragma: no cover - timesfm absent
        try:
            import timesfm
        except ImportError:
            return super()._load_hook(h)
        model = timesfm.TimesFm(context_len=self.context_length, horizon_len=h)

        def hook(contexts: np.ndarray) -> np.ndarray:
            point, _quantiles = model.forecast(list(contexts))
            return np.asarray(point, dtype=float)

        return hook


class MoiraiForecaster(_FoundationAdapter):
    """Salesforce Moirai zero-shot adapter (foundation_forecast.py:265-370):
    sample-path median of the uni2ts probabilistic head, whole batch in
    one forward pass."""

    _STACK = "torch + uni2ts"
    _MODEL_DOC = "e.g. Salesforce/moirai-1.1-R-small"

    def __init__(self, model_name: str = "Salesforce/moirai-1.1-R-small",
                 num_samples: int = 20, **kw):
        super().__init__(model_name, **kw)
        self.num_samples = num_samples

    def _load_hook(self, h: int):  # pragma: no cover - uni2ts absent
        try:
            import torch
            from uni2ts.model.moirai_forecast import MoiraiForecast
        except ImportError:
            return super()._load_hook(h)
        pipeline = MoiraiForecast.from_pretrained(self.model_name)

        def hook(contexts: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                samples, _point = pipeline(
                    torch.tensor(contexts, dtype=torch.float32),
                    prediction_length=h, num_samples=self.num_samples,
                )
            return np.median(samples.cpu().numpy(), axis=-2)

        return hook


class TimeLLMForecaster(_FoundationAdapter):
    """Time-LLM adapter (ref adapters/llm_forecast.py:163-294): series
    patched into a frozen-LLM prompt space. The loader embeds each
    context as patch tokens projected into the backbone's hidden size,
    runs the frozen transformer, and linearly maps the last hidden
    state to h steps — the Time-LLM inference shape with an untrained
    output head unless ``head_weights`` are supplied.
    ``predict_batch`` plugs any local substitute."""

    _STACK = "torch + transformers"
    _MODEL_DOC = "e.g. gpt2 backbone"

    def __init__(self, model_name: str = "gpt2", patch_len: int = 16, **kw):
        super().__init__(model_name, **kw)
        self.patch_len = patch_len

    def _load_hook(self, h: int):  # pragma: no cover - transformers absent
        try:
            import torch
            from transformers import AutoModel
        except ImportError:
            return super()._load_hook(h)
        backbone = AutoModel.from_pretrained(self.model_name)
        hidden = backbone.config.hidden_size
        torch.manual_seed(0)
        proj_in = torch.nn.Linear(self.patch_len, hidden)
        head = torch.nn.Linear(hidden, h)

        def hook(contexts: np.ndarray) -> np.ndarray:
            x = torch.tensor(contexts, dtype=torch.float32)
            mu = x.mean(dim=1, keepdim=True)
            sd = x.std(dim=1, keepdim=True).clamp_min(1e-6)
            x = (x - mu) / sd
            pl_ = self.patch_len
            n_patch = x.shape[1] // pl_
            patches = x[:, : n_patch * pl_].reshape(-1, n_patch, pl_)
            with torch.no_grad():
                hs = backbone(inputs_embeds=proj_in(patches)).last_hidden_state
                out = head(hs[:, -1, :])
            return (out * sd + mu).numpy()

        return hook


class LLMPSForecaster(TimeLLMForecaster):
    """LLM-PS adapter (ref adapters/llm_forecast.py:294-420):
    prompt-as-prefix variant sharing Time-LLM's patch-embed inference
    path. Requires torch + transformers."""

    _STACK = "torch + transformers"
    _MODEL_DOC = "prompt-as-prefix LLM forecaster"


_ADAPTERS = {
    "chronos": ChronosForecaster,
    "timesfm": TimesFMForecaster,
    "moirai": MoiraiForecaster,
    "timellm": TimeLLMForecaster,
    "llmps": LLMPSForecaster,
}


def foundation_forecast(
    df: DataFrame,
    model: str = "chronos",
    h: int = 12,
    predict_batch=None,
    **kw,
) -> DataFrame:
    """Dispatcher (foundation_forecast.py:372-408): pick an adapter by
    name, forecast h steps. ``predict_batch`` plugs any local model."""
    if model not in _ADAPTERS:
        raise ValueError(f"unknown foundation model {model!r}; choose from {sorted(_ADAPTERS)}")
    return _ADAPTERS[model](predict_batch=predict_batch, **kw).predict(df, h)


# ---------------------------------------------------------------------------
# foundation-model embeddings (ref adapters/embeddings.py:47-210):
# fixed-length vectors per series for downstream clustering/similarity


def batch_embed(
    df: DataFrame,
    embed_batch,
    context_length: int = 64,
    id_col: str = ID,
    time_col: str = TIME,
    target_col: str = TARGET,
) -> DataFrame:
    """Distributed embedding extraction: per bucket of series, stack the
    last ``context_length`` observations (leading-zero padded) into one
    (S, context_length) matrix and make a SINGLE ``embed_batch`` call
    -> (S, d). ``embed_batch(contexts, lengths)`` also receives the
    per-series count of REAL trailing steps, so model hooks mask the
    leading zero-padding instead of embedding it as data (short series
    would otherwise be dominated by pad zeros).
    Output [id, embedding: array<float>] — the embeddings
    table convention, so the result feeds ``embedsim`` (cosine top-k,
    LSH/IVF ANN, near-dup pairs) and the clusterers directly. The
    reference returns wide ``emb_i`` columns (adapters/embeddings.py:
    35-45); select ``F.col("embedding")[i]`` to widen."""
    import pandas as pd

    from polars_ts_spark.operators.deep import stack_contexts
    from polars_ts_spark.operators.kernel import for_series_batches

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, ctxs, lens, _ts, _fr = stack_contexts(
            pdf, [target_col], context_length, id_col, time_col,
            with_times=False)
        if not ids:
            return pd.DataFrame({id_col: pd.Series([], dtype="str"),
                                 "embedding": pd.Series([], dtype="object")})
        E = np.asarray(embed_batch(np.stack(ctxs)[:, :, 0], np.asarray(lens)),
                       dtype=np.float32)
        return pd.DataFrame({id_col: ids, "embedding": [e.tolist() for e in E]})

    schema = f"{id_col} string, embedding array<float>"
    return for_series_batches(df, kern, schema, id_col=id_col, time_col=time_col)


class _FoundationEmbedder:
    """Shared shell for the embedding adapters: a pluggable
    ``embed_batch`` hook runs inside the distributed plumbing above."""

    _STACK = "torch"
    _MODEL_DOC = ""

    def __init__(self, model_name: str, context_length: int = 64,
                 embed_batch=None,
                 id_col: str = ID, time_col: str = TIME, target_col: str = TARGET):
        self.model_name = model_name
        self.context_length = context_length
        self._hook = embed_batch
        self.id_col, self.time_col, self.target_col = id_col, time_col, target_col

    def _load_hook(self):  # pragma: no cover - stacks absent in CI
        raise ImportError(
            f"{self._STACK} is required for {type(self).__name__} "
            f"({self._MODEL_DOC}); pass embed_batch= to plug a custom or "
            "stub encoder into the same distributed plumbing"
        )

    def embed(self, df: DataFrame) -> DataFrame:
        hook = self._hook or self._load_hook()
        return batch_embed(df, hook, self.context_length,
                           self.id_col, self.time_col, self.target_col)


class ChronosEmbedder(_FoundationEmbedder):
    """Chronos encoder embeddings (adapters/embeddings.py:47-127):
    ``ChronosPipeline.embed`` handles the NUMERIC tokenization (Chronos
    has no text tokenizer — quantile-binning lives in the chronos
    package, same stack the sibling ChronosForecaster uses); the
    encoder output is mean-pooled over time."""

    _STACK = "torch + chronos"
    _MODEL_DOC = "e.g. amazon/chronos-t5-small"

    def __init__(self, model_name: str = "amazon/chronos-t5-small", **kw):
        super().__init__(model_name, **kw)

    def _load_hook(self):  # pragma: no cover - chronos absent
        try:
            import torch
            from chronos import ChronosPipeline
        except ImportError:
            return super()._load_hook()
        pipe = ChronosPipeline.from_pretrained(self.model_name)

        def hook(contexts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
            ctx = contexts.astype(np.float32).copy()
            for i, n in enumerate(lengths):  # pad -> NaN: Chronos masks ~isnan
                ctx[i, : ctx.shape[1] - int(n)] = np.nan
            with torch.no_grad():
                emb, _state = pipe.embed(torch.tensor(ctx))  # (S, seq, d_model)
            return emb.mean(dim=1).cpu().numpy()

        return hook


class MomentEmbedder(_FoundationEmbedder):
    """MOMENT embeddings (adapters/embeddings.py:130-210): the
    pipeline's embedding head over each context window."""

    _STACK = "torch + momentfm"
    _MODEL_DOC = "e.g. AutonLab/MOMENT-1-small"

    def __init__(self, model_name: str = "AutonLab/MOMENT-1-small", **kw):
        super().__init__(model_name, **kw)

    def _load_hook(self):  # pragma: no cover - momentfm absent
        try:
            import torch
            from momentfm import MOMENTPipeline
        except ImportError:
            return super()._load_hook()
        model = MOMENTPipeline.from_pretrained(
            self.model_name, model_kwargs={"task_name": "embedding"})
        model.init()
        model.eval()
        # MOMENT checkpoints are trained on a FIXED seq_len (512): left-
        # zero-pad shorter contexts and mark real steps via input_mask —
        # feeding raw short windows is off-distribution or errors
        seq_len = int(getattr(getattr(model, "config", None), "seq_len", 512) or 512)

        def hook(contexts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
            s, n = contexts.shape
            x = np.zeros((s, seq_len), dtype=np.float32)
            mask = np.zeros((s, seq_len), dtype=np.float32)
            take = min(n, seq_len)
            x[:, -take:] = contexts[:, -take:]
            for i, ln in enumerate(lengths):  # only REAL steps are observed
                mask[i, seq_len - min(int(ln), take):] = 1.0
            xt = torch.tensor(x, dtype=torch.float32).unsqueeze(1)
            mt = torch.tensor(mask, dtype=torch.float32)
            with torch.no_grad():
                out = model(x_enc=xt, input_mask=mt)
            return out.embeddings.cpu().numpy()

        return hook


def to_chronos_embeddings(df: DataFrame, embed_batch=None, **kw) -> DataFrame:
    """Functional form of ChronosEmbedder (ref adapters/embeddings.py:47)."""
    return ChronosEmbedder(embed_batch=embed_batch, **kw).embed(df)


def to_moment_embeddings(df: DataFrame, embed_batch=None, **kw) -> DataFrame:
    """Functional form of MomentEmbedder (ref adapters/embeddings.py:130)."""
    return MomentEmbedder(embed_batch=embed_batch, **kw).embed(df)
