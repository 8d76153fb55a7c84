"""RDF vocabulary constants.

The reference declares 8 custom vocabularies at ``lib/util.rb:1-10`` and uses
the rdf gem's built-ins (DC, DC11, FOAF, SKOS, OWL, RDF core).  All URIs below
are public, standard vocabulary namespaces.
"""

# Built-in namespaces (rdf gem built-ins)
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"
DC_NS = "http://purl.org/dc/terms/"          # RDF::DC   (dcterms)
DC11_NS = "http://purl.org/dc/elements/1.1/"  # RDF::DC11
FOAF_NS = "http://xmlns.com/foaf/0.1/"
SKOS_NS = "http://www.w3.org/2004/02/skos/core#"

# Custom vocabularies (lib/util.rb:1-10)
BIBO_NS = "http://purl.org/ontology/bibo/"
RDA_NS = "http://RDVocab.info/Elements/"
RDAG2_NS = "http://RDVocab.info/ElementsGr2/"
DCAM_NS = "http://purl.org/dc/dcam/"
FRBR_NS = "http://purl.org/vocab/frbr/core#"
BIO_NS = "http://purl.org/vocab/bio/0.1/"
OV_NS = "http://open.vocab.org/terms/"
OL_NS = "http://api.talis.com/stores/openlibrary/terms#"

# RDF core terms
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_VALUE = RDF_NS + "value"

# FOAF terms
FOAF_AGENT = FOAF_NS + "Agent"
FOAF_NAME = FOAF_NS + "name"
FOAF_HOMEPAGE = FOAF_NS + "homepage"
FOAF_IS_PRIMARY_TOPIC_OF = FOAF_NS + "isPrimaryTopicOf"
FOAF_DEPICTION = FOAF_NS + "depiction"
FOAF_PAGE = FOAF_NS + "page"
FOAF_MADE = FOAF_NS + "made"

# SKOS terms
SKOS_ALT_LABEL = SKOS_NS + "altLabel"
SKOS_PREF_LABEL = SKOS_NS + "prefLabel"
SKOS_CONCEPT = SKOS_NS + "Concept"
SKOS_CONCEPT_SCHEME = SKOS_NS + "ConceptScheme"
SKOS_IN_SCHEME = SKOS_NS + "inScheme"

# DC terms (dcterms)
DC_DATE = DC_NS + "date"
DC_TITLE = DC_NS + "title"
DC_CREATED = DC_NS + "created"
DC_MODIFIED = DC_NS + "modified"
DC_ISSUED = DC_NS + "issued"
DC_LANGUAGE = DC_NS + "language"
DC_SUBJECT = DC_NS + "subject"
DC_TYPE = DC_NS + "type"
DC_DESCRIPTION = DC_NS + "description"
DC_TABLE_OF_CONTENTS = DC_NS + "tableOfContents"
DC_EXTENT = DC_NS + "extent"
DC_IS_VERSION_OF = DC_NS + "isVersionOf"
DC_HAS_VERSION = DC_NS + "hasVersion"
DC_DATE_COPYRIGHTED = DC_NS + "dateCopyrighted"
DC_CREATOR = DC_NS + "creator"
DC_LCC = DC_NS + "LCC"
DC_DDC = DC_NS + "DDC"

# DC 1.1 elements
DC11_PUBLISHER = DC11_NS + "publisher"
DC11_CONTRIBUTOR = DC11_NS + "contributor"
DC11_SOURCE = DC11_NS + "source"
DC11_CREATOR = DC11_NS + "creator"
DC11_SUBJECT = DC11_NS + "subject"
DC11_IDENTIFIER = DC11_NS + "identifier"

# OWL
OWL_SAME_AS = OWL_NS + "sameAs"

# BIBO
BIBO_BOOK = BIBO_NS + "Book"
BIBO_ISBN = BIBO_NS + "isbn"
BIBO_ISBN10 = BIBO_NS + "isbn10"
BIBO_ISBN13 = BIBO_NS + "isbn13"
BIBO_LCCN = BIBO_NS + "lccn"
BIBO_OCLCNUM = BIBO_NS + "oclcnum"
BIBO_VOLUME = BIBO_NS + "volume"
BIBO_NUM_PAGES = BIBO_NS + "numPages"
BIBO_EDITION = BIBO_NS + "edition"
BIBO_AUTHOR_LIST = BIBO_NS + "authorList"
BIBO_URI = BIBO_NS + "uri"

# RDA Elements
RDA_OTHER_TITLE_INFORMATION = RDA_NS + "otherTitleInformation"
RDA_VARIANT_TITLE = RDA_NS + "variantTitle"
RDA_PLACE_OF_PUBLICATION = RDA_NS + "placeOfPublication"
RDA_DIMENSIONS = RDA_NS + "dimensions"
RDA_TITLE_OF_THE_WORK = RDA_NS + "titleOfTheWork"
RDA_STATEMENT_OF_RESPONSIBILITY = RDA_NS + "statementOfResponsibility"
RDA_TITLE_PROPER = RDA_NS + "titleProper"
RDA_NOTE = RDA_NS + "note"

# RDA Group 2
RDAG2_FULLER_FORM_OF_NAME = RDAG2_NS + "fullerFormOfName"
RDAG2_TITLE_OF_THE_PERSON = RDAG2_NS + "titleOfThePerson"

# DCAM
DCAM_IS_MEMBER_OF = DCAM_NS + "isMemberOf"

# FRBR
FRBR_WORK = FRBR_NS + "Work"

# BIO
BIO_BIRTH = BIO_NS + "Birth"
BIO_DEATH = BIO_NS + "Death"
BIO_PRINCIPAL = BIO_NS + "principal"
BIO_EVENT = BIO_NS + "event"
BIO_OLB = BIO_NS + "olb"

# OV / OL
OV_COMMON_MANIFESTATION = OV_NS + "commonManifestation"
OL_AUTHOR = OL_NS + "author"

# Datatypes
XSD_INTEGER = XSD_NS + "integer"
XSD_DATETIME = XSD_NS + "dateTime"

URI_PREFIX = "http://openlibrary.org"  # openlibrary.rb:8
