from delivr_cfos_tpu.analysis.ontology import parse_ontology_xml

__all__ = ["parse_ontology_xml"]
