#!/usr/bin/env python3
"""Capture the reference's OFFLINE provider-dispatch behavior as goldens.

Runs the reference's own ``find_provider`` ladder (geoextent/lib/extent.py)
against a battery of identifiers drawn from the reference's test files, with
all heavy/unavailable native deps stubbed and the network absent (this
sandbox has zero egress, so every doi.org resolution / API probe fails the
way the reference's own offline fallbacks handle it). The captured outcome
(matching provider class + extracted record id fields, or null) is the
semantic contract for graft.providers.Dispatch.validateOffline — re-run this
script to regenerate tools/provider_goldens.json.
"""
import json
import os
import sys
import types
import importlib.abc
import importlib.machinery

REFERENCE = "/root/reference"


class AnyObj:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return AnyObj()

    def __getattr__(self, n):
        if n.startswith("__"):
            raise AttributeError(n)
        return AnyObj()


STUB_ROOTS = {
    "osgeo", "patoolib", "magic", "geojsonio", "pyproj", "filesizelib",
    "humanfriendly", "laspy", "tqdm", "requests_cache", "defusedxml",
    "owslib", "spacy", "geopy", "dateparser", "wordfreq", "zarr",
    "xmltodict", "rasterio", "fiona", "netCDF4", "bs4", "lxml", "html5lib",
    "pystac", "pystac_client", "validators", "rdflib", "yaml", "curl_cffi",
}


class StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        m = types.ModuleType(spec.name)
        m.__getattr__ = (
            lambda n: AnyObj()
            if not n.startswith("__")
            else (_ for _ in ()).throw(AttributeError(n))
        )
        m.__path__ = []
        return m

    def exec_module(self, module):
        pass


class StubFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path, target=None):
        if fullname.split(".")[0] in STUB_ROOTS:
            return importlib.machinery.ModuleSpec(fullname, StubLoader(), is_package=True)
        return None


IDENTIFIERS = [
    # Zenodo / InvenioRDM family
    "10.5281/zenodo.4593540", "10.5281/zenodo.820562", "10.5281/zenodo.abc",
    "10.5281/zenodo.", "https://zenodo.org/records/4593540",
    "https://zenodo.org/record/820562", "https://zenodo.org/api/records/820562",
    "10.22002/D1.1705", "https://data.caltech.edu/records/zd221-sqw79",
    "10.48436/jpzv9-c8w75", "10.23728/b2share.26jnj-a4x24",
    "https://b2share.eudat.eu/records/26jnj-a4x24",
    "https://archive.materialscloud.org/records/2022.126",
    "https://gkhub.earthobservations.org/records/sfcmr-n1p51",
    # Dryad
    "10.5061/dryad.0k6djhb7x", "https://datadryad.org/dataset/doi:10.5061/dryad.0k6djhb7x",
    "https://datadryad.org/stash/dataset/doi:10.5061/dryad.wm37pvmvf",
    "https://datadryad.org/dataset/", "10.5061/dryad",
    # 4TU / Figshare
    "10.4121/19361018.v2", "10.4121/uuid:8ce9d22a-9aa4-41ea-9299-f44efa9c8b75",
    "https://data.4tu.nl/datasets/3035126d-ee51-4dbd-a187-5f6b0be85e9f/1",
    "10.6084/m9.figshare.12345678", "https://figshare.com/articles/dataset/x/1138736",
    "https://api.figshare.com/v2/articles/19248626",
    # Pangaea
    "10.1594/PANGAEA.734969", "10.1594/PANGAEA.abc", "10.1594/INVALID.123",
    "https://doi.pangaea.de/10.1594/PANGAEA.734969", "https://pangaea.de/10.1594/PANGAEA.842589",
    # OSF
    "10.17605/OSF.IO/9JG2U", "10.17605/osf.io/j2sta", "OSF.IO/9JG2U",
    "https://osf.io/4xe6z", "https://osf.io/4xe6z/", "https://accounts.osf.io/4xe6z",
    "https://doi.org/10.17605/OSF.IO/A5F3E",
    # Dataverse
    "10.7910/DVN/OMV93V", "doi:10.7910/DVN/OMV93V", "10.34894/EXAMPLE1",
    "10.11588/DATA/TJNQZG", "10.17617/3.QZGTDU", "10.71830/VDMUWW",
    "https://dataverse.harvard.edu/dataset.xhtml?persistentId=doi:10.7910/DVN/OMV93V",
    "https://edmond.mpg.de/dataset.xhtml?persistentId=doi:10.17617/3.QZGTDU",
    # GFZ / RADAR / Arctic / DataOne / GBIF
    "10.5880/GFZ.2.1.2020.001", "10.5880/WRONG.2.1.2020.001",
    "http://dataservices.gfz-potsdam.de/panmetaworks/showshort.php?id=escidoc:5148893",
    "10.35097/600", "10.35097/tvn5vujqfvf99f32",
    "https://www.radar-service.eu/radar/en/dataset/tvn5vujqfvf99f32",
    "10.18739/A2KW57K57", "https://arcticdata.io/catalog/view/doi%3A10.18739%2FA2Z892H2J",
    "https://arcticdata.io/catalog/view/urn%3Auuid%3A054b4c9a-8be1-4d28-8724-5e2beb0ce4e6",
    "10.5063/F1Z60M87", "10.6085/AA/PISCO_kelpforest.1.11",
    "https://search.dataone.org/view/doi:10.5063/F1Z60M87",
    "10.15468/6bleia", "10.15472/lavgys", "https://www.gbif.org/dataset/8575f23e-f762-11e1-a439-00145eb45e9a",
    # Pensoft (journals, DOI prefix 10.3897 minus GBIF's)
    "10.3897/BDJ.2.e1068", "https://bdj.pensoft.net/article/1068/",
    # BGR / BAW / MDI-DE / GDI-DE
    "10.25928/MEDKAM.1", "10.25929/HK1000",
    "http://geoportal.bgr.de/mapapps/resources/apps/geoportal/index.html?id=d764e73b-27e4-4aaa-b187-b6141c115eb4",
    "10.48437/02.2023.K.0601.0001",
    "https://datenrepository.baw.de/trefferanzeige?docuuid=c394f0fc-4b29-4fea-b073-2e00d3ec301a",
    "https://nokis.mdi-de-dienste.org/trefferanzeige?docuuid=b4a37fc6-87ea-4dd7-b02b-639a4faa9357",
    "https://www.geoportal.de/Metadata/b4a37fc6-87ea-4dd7-b02b-639a4faa9357",
    "https://gdk.gdi-de.org/gdi-de/srv/ger/catalog.search#/metadata/b4a37fc6-87ea-4dd7-b02b-639a4faa9357",
    # Opara / Senckenberg / CKAN
    "10.25532/OPARA-581", "10.25532/INVALID-123",
    "https://opara.zih.tu-dresden.de/items/55a59955-12ed-4426-b5da-9495c12e64e9",
    "10.12761/sgn.2018.10225", "https://dataportal.senckenberg.de/dataset/lutra-lutra-collection",
    "https://ckan.govdata.de/dataset/some-dataset-id",
    "https://open.canada.ca/data/en/dataset/4cedd37e-0023-41fe-8eff-bea45385e469",
    "https://unknownckan.example.org/dataset/foo",
    # Mendeley / DEIMS / NFDI4Earth / HALO / SEANOE / GSW / UKCEH
    "10.17632/ybx6zp2rfp.1", "https://data.mendeley.com/datasets/ybx6zp2rfp/1",
    "https://deims.org/dataset/75a7f938-7c77-11e3-8832-005056ab003f",
    "https://deims.org/api/sites/deae80cc-10e6-4058-a45a-8ff9ee70b482",
    "https://onestop4all.nfdi4earth.de/result/D1032881050-SCIOPS",
    "https://halo-db.pa.op.dlr.de/dataset/8951",
    "10.17882/103743", "https://www.seanoe.org/data/00907/101837/",
    "https://pubs.geoscienceworld.org/gsa/geology/article/46/3/203/526701",
    "10.5285/02977a5d-00a0-44f8-baee-d2e0eecb5df0",
    "https://catalogue.ceh.ac.uk/documents/02977a5d-00a0-44f8-baee-d2e0eecb5df0",
    # STAC / git hosts / SWH / raster / Wikidata
    "https://planetarycomputer.microsoft.com/api/stac/v1/collections/landsat-c2-l2",
    "https://api.stac.worldpop.org/collections/CHE",
    "https://example.com/stac/collections/foo",
    "https://github.com/nuest/geoextent", "https://github.com/user/repo/tree/main/data",
    "https://github.com/user/repo.git", "https://GitHub.com/User/Repo/",
    "https://github.com/o/r/blob/main/x", "https://github.com/o/r/issues/5",
    "https://gitlab.com/user/project", "https://git.rwth-aachen.de/group/proj",
    "https://myhost-gitlab.example.org/grp/proj", "https://codeberg.org/user/repo",
    "swh:1:dir:94a9ed024d3859793618152ea559a168bbcbb5e2",
    "swh:1:cnt:94a9ed024d3859793618152ea559a168bbcbb5e2;origin=https://github.com/user/repo",
    "https://archive.softwareheritage.org/swh:1:dir:94a9ed024d3859793618152ea559a168bbcbb5e2",
    "https://example.com/dem/tile_12.tif", "https://example.com/ortho.tiff?token=abc",
    "Q26080", "Q64", "https://www.wikidata.org/wiki/Q60786916",
    "http://www.wikidata.org/entity/Q64",
    # case/edge variants
    "q64", "Q1234567", "https://WWW.wikidata.org/wiki/Q35",
    "DOI: 10.1594/PANGAEA.150150", "doi:10.17605/osf.io/gfwhj",
    "10.5281/ZENODO.123", "osf.io/9jg2u", "Osf.Io/J2STA", "ab3x9",
    "https://zenodo.org/records/4593540/", "https://osf.io/4xe6z#files",
    "https://datadryad.org/stash/dataset/10.5061/dryad.fqz612jw3",
    "https://example.com/DEM.TIF", "swh:1:rev:0000000000000000000000000000000000000000",
    "https://codeberg.org/solo",
    # negatives
    "10.1000/example.doi", "10.1234/something", "http://example.com",
    "not an identifier at all", "ftp://archive.example.org/data.zip",
    "https://bitbucket.org/user/repo", "",
    # per-rung negative coverage (round-5: every rung gets >=1 in-family
    # identifier the rung REJECTS, so the spec's 37/37 coverage table can
    # assert both directions per rung)
    "https://dataverse.harvard.edu/dataset.xhtml",
    "10.35097/", "https://arcticdata.io/catalog/view/",
    "https://search.dataone.org/view/", "https://www.gbif.org/dataset/not-a-uuid",
    "https://nokis.mdi-de-dienste.org/trefferanzeige?docuuid=",
    "https://www.geoportal.de/Metadata/", "https://data.mendeley.com/datasets/",
    "https://deims.org/about", "https://onestop4all.nfdi4earth.de/search?q=x",
    "https://halo-db.pa.op.dlr.de/", "https://www.seanoe.org/home",
    "https://pubs.geoscienceworld.org/", "10.5285/not-a-uuid",
    "https://example.com/collections", "https://github.com/solo",
    "https://gitlab.com/solo", "swh:1:dir:zzz",
    "https://example.com/photo.png",
    # the reference is LENIENT on 10.35097/ / empty arcticdata view /
    # non-uuid gbif dataset ids (captured as matches above) — these are the
    # actually-rejected in-family shapes
    "https://www.radar-service.eu/radar/en/search",
    "https://arcticdata.io/about", "https://www.gbif.org/occurrence/123",
    # OJS / Janeway landing pages: these rungs are network-only in the
    # reference (sniffing needs a fetch), so their OFFLINE contract is None
    # even for perfectly-shaped journal URLs — locked here both ways
    "https://revistas.ucm.es/index.php/FITE/article/view/61027",
    "https://journals.sfu.ca/index.php/abc/article/view/99",
    "https://journal.example.org/article/id/123/",
    "https://openlibhums.org/article/id/4577/",
]


def main():
    sys.meta_path.insert(0, StubFinder())
    sys.path.insert(0, REFERENCE)
    os.environ.setdefault("GEOEXTENT_NO_NETWORK", "1")
    # No-egress semantics with fast failure: kill the request at the
    # requests layer so urllib3's retry/backoff sleeps never run — the
    # observable behavior (ConnectionError from Session.request) is identical
    # to a sandbox with no route out, just instant.
    import requests

    def _refuse(*a, **k):
        raise requests.exceptions.ConnectionError(
            "network disabled (offline golden capture)")

    requests.Session.request = _refuse
    requests.request = _refuse
    requests.get = _refuse
    requests.head = _refuse
    requests.post = _refuse
    from geoextent.lib.extent import _get_content_providers
    from geoextent.lib.content_providers.providers import find_provider

    providers = _get_content_providers()
    out = {}
    id_attrs = [
        "record_id", "dataset_id", "project_id", "persistent_id", "qid",
        "record_uuid", "dataset_key", "doi", "item_uuid", "collection_id",
        "cordra_id", "resource_uuid", "article_url", "url",
        "catalog_record_uuid", "article_id",
    ]
    for ref in IDENTIFIERS:
        try:
            p = find_provider(ref, providers)
        except Exception as e:  # ladder must never throw; record if it does
            out[ref] = {"error": str(e)[:200]}
            continue
        if p is None:
            out[ref] = None
        else:
            rec = {"provider": type(p).__name__}
            for a in id_attrs:
                v = getattr(p, a, None)
                if isinstance(v, str):
                    rec[a] = v
            # InvenioRDM reports which instance matched via its name field
            if type(p).__name__ == "InvenioRDM" and getattr(p, "name", None):
                rec["instance"] = p.name
            out[ref] = rec
    path = os.path.join(os.path.dirname(__file__), "provider_goldens.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    matched = sum(1 for v in out.values() if v and "provider" in v)
    print(f"captured {len(out)} identifiers, {matched} matched -> {path}")


if __name__ == "__main__":
    main()
