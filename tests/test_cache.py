"""LRU program-cache bound (VERDICT r2: unbounded RL caches leaked
compiled programs across PSF/geometry sweeps)."""

from shrimpy_tpu.utils.cache import LruCache


def test_lru_evicts_oldest_and_touch_refreshes():
    c = LruCache(maxsize=3)
    for k in "abc":
        c[k] = k.upper()
    assert c["a"] == "A"  # touch: a becomes most recent
    c["d"] = "D"  # evicts b (oldest untouched)
    assert "b" not in c
    assert all(k in c for k in "acd")
    assert len(c) == 3


def test_rl_program_caches_are_bounded():
    from shrimpy_tpu.ops import deconv, rl_fused

    for cache in (
        deconv._RL_LINEAR_CACHE,
        deconv._RL_ZY_CACHE,
        deconv._SEP_MATS_NP_CACHE,
        deconv._SEP_MATS_DEV_CACHE,
        rl_fused._RL_FUSED_CACHE,
    ):
        assert isinstance(cache, LruCache)
        assert cache.maxsize <= 16
