def build_model(loftr_config):
    """Model factory: CasMTR when cascade=True, plain QuadtreeLoFTR otherwise."""
    if loftr_config.cascade:
        from casmtr_tpu.models.casmtr import CasMTR
        return CasMTR(loftr_config)
    from casmtr_tpu.models.loftr import QuadtreeLoFTR
    return QuadtreeLoFTR(loftr_config)
