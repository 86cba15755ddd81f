from glimpseprune_tpu.gp.fuser import (
    ATTN_FUSERS,
    AttnFuserDummy,
    AttnFuserV1,
    AttnFuserV2,
    make_fuser,
)

__all__ = ["ATTN_FUSERS", "AttnFuserDummy", "AttnFuserV1", "AttnFuserV2", "make_fuser"]
