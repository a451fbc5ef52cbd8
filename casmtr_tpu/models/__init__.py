def build_model(loftr_config, refine: bool = False):
    """Model factory: CasMTR when cascade=True, plain QuadtreeLoFTR otherwise;
    refine=True selects the PMT-refine assembly (frozen quadtree trunk +
    ladder + cas_ heads; reference train.py:64,108 --refine)."""
    if refine:
        from casmtr_tpu.models.casmtr_refine import CasMTRRefine
        return CasMTRRefine(loftr_config)
    if loftr_config.cascade:
        from casmtr_tpu.models.casmtr import CasMTR
        return CasMTR(loftr_config)
    from casmtr_tpu.models.loftr import QuadtreeLoFTR
    return QuadtreeLoFTR(loftr_config)
