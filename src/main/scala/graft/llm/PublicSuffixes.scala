package graft.llm

/** Static subset of the Mozilla Public Suffix List (publicsuffix.org —
  * public data): the common TWO-LABEL public suffixes under which
  * registrations actually happen, so `a.b.co.uk` groups as `b.co.uk`
  * rather than the last-two-labels heuristic's `co.uk` (which would merge
  * every UK company into one "domain" for quotas and blocklists — the
  * Dolma/RefinedWeb pipelines key on the true registrable domain).
  *
  * A static literal subset by design: the environment has no network, the
  * full PSL churns, and a quota/blocklist key only needs the high-traffic
  * suffixes to be right. Hosts under suffixes not listed here fall back to
  * the last-two-labels heuristic (declared in [[Web.registrableDomain]]).
  * Swap in the full list (or a maintained dependency) for production use.
  */
object PublicSuffixes {

  /** Two-label public suffixes: a host's registrable domain is its last
    * THREE labels when the last two match one of these. */
  val twoLabel: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "ltd.uk", "me.uk",
    "nhs.uk", "plc.uk", "police.uk", "sch.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "mil.nz",
    // Japan
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "blog.br", "eco.br", "emp.br", "esp.br", "far.br", "flog.br",
    "imb.br", "ind.br", "inf.br", "jus.br", "leg.br", "mp.br",
    "nom.br", "not.br", "ntr.br", "odo.br", "ppg.br", "pro.br",
    "psc.br", "psi.br", "rec.br", "slg.br", "srv.br", "tmp.br",
    "tur.br", "tv.br", "vet.br", "wiki.br",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "edu.za", "ac.za", "web.za",
    "mil.za", "nom.za", "school.za",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
    "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn", "hn.cn",
    "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn", "qh.cn",
    "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn", "xj.cn",
    "xz.cn", "yn.cn", "zj.cn",
    // South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr", "daejeon.kr",
    // Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw",
    "game.tw", "club.tw", "ebiz.tw",
    // Hong Kong
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    // Singapore
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    // Mexico
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    // Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "tur.ar", "musica.ar",
    // Colombia
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co", "mil.co",
    // Israel
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "k12.il",
    // Russia
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru", "int.ru",
    // Ukraine
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    // Turkey
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "gen.tr",
    "web.tr", "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "info.tr",
    "k12.tr", "name.tr", "pol.tr", "tel.tr", "tv.tr", "kep.tr",
    // Thailand
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    // Indonesia
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "my.id", "biz.id", "desa.id", "ponpes.id",
    // Malaysia
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    // Philippines
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph", "mil.ph",
    "i.ph",
    // Vietnam
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "biz.pl", "wroc.pl", "krakow.pl", "poznan.pl", "gda.pl",
    // Saudi Arabia
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa",
    "sch.sa",
    // United Arab Emirates
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    // Egypt
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "eun.eg", "mil.eg",
    "name.eg", "sci.eg",
    // Nigeria
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng", "sch.ng",
    "mil.ng", "mobi.ng", "i.ng",
    // Kenya
    "co.ke", "ne.ke", "or.ke", "ac.ke", "go.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    // Uruguay
    "com.uy", "net.uy", "org.uy", "edu.uy", "gub.uy", "mil.uy",
    // Ecuador
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "gov.ec", "info.ec",
    "fin.ec", "med.ec", "mil.ec", "pro.ec", "k12.ec",
    // Venezuela
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve", "co.ve",
    "info.ve", "web.ve",
    // Peru
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    // Chile
    "gob.cl", "gov.cl", "mil.cl", "co.cl",
    // Paraguay
    "com.py", "net.py", "org.py", "edu.py", "gov.py", "mil.py", "coop.py",
    // Bolivia
    "com.bo", "net.bo", "org.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo",
    "tv.bo", "web.bo",
    // Costa Rica
    "co.cr", "ac.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    // Guatemala
    "com.gt", "net.gt", "org.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt",
    // Dominican Republic
    "com.do", "net.do", "org.do", "edu.do", "gob.do", "gov.do", "mil.do",
    "sld.do", "art.do", "web.do",
    // Pakistan
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk", "biz.pk",
    "web.pk", "gok.pk", "gob.pk", "gkp.pk", "gop.pk", "gos.pk",
    // Bangladesh
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    // Sri Lanka
    "com.lk", "net.lk", "org.lk", "edu.lk", "gov.lk", "sch.lk", "ac.lk",
    "int.lk", "grp.lk", "ltd.lk", "ngo.lk", "soc.lk", "web.lk",
    // Nepal
    "com.np", "net.np", "org.np", "edu.np", "gov.np", "mil.np", "aero.np",
    "asia.np", "biz.np", "coop.np", "info.np", "jobs.np", "mobi.np",
    "museum.np", "name.np", "pro.np",
    // Greece
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    // Portugal
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "nome.pt",
    "publ.pt",
    // Romania
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    // Hungary
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "2000.hu", "agrar.hu", "bolt.hu", "city.hu", "film.hu", "forum.hu",
    "games.hu", "hotel.hu", "ingatlan.hu", "jogasz.hu", "konyvelo.hu",
    "lakas.hu", "media.hu", "news.hu", "reklam.hu", "sex.hu", "shop.hu",
    "suli.hu", "szex.hu", "tozsde.hu", "utazas.hu", "video.hu",
    // United States (common state/affinity)
    "ak.us", "al.us", "ar.us", "az.us", "ca.us", "co.us", "ct.us",
    "dc.us", "de.us", "fl.us", "ga.us", "hi.us", "ia.us", "id.us",
    "il.us", "in.us", "ks.us", "ky.us", "la.us", "ma.us", "md.us",
    "me.us", "mi.us", "mn.us", "mo.us", "ms.us", "mt.us", "nc.us",
    "nd.us", "ne.us", "nh.us", "nj.us", "nm.us", "nv.us", "ny.us",
    "oh.us", "ok.us", "or.us", "pa.us", "ri.us", "sc.us", "sd.us",
    "tn.us", "tx.us", "ut.us", "va.us", "vt.us", "wa.us", "wi.us",
    "wv.us", "wy.us",
    // PRIVATE-registry two-label suffixes (the PSL PRIVATE section —
    // hosting/platform domains where each customer subdomain is an
    // independent registrant; without these, one blocklist/quota key
    // would swallow every site on the platform)
    "blogspot.com", "github.io", "gitlab.io", "herokuapp.com",
    "appspot.com", "cloudfront.net", "azurewebsites.net",
    "firebaseapp.com", "web.app", "netlify.app", "vercel.app",
    "pages.dev", "workers.dev", "glitch.me", "readthedocs.io",
    "neocities.org", "onrender.com", "fly.dev", "surge.sh")

  /** THREE-label private-registry suffixes: a host's registrable domain
    * is its last FOUR labels when the last three match one of these
    * (`mybucket.s3.amazonaws.com` is a registrant-controlled bucket, not
    * part of `amazonaws.com` — critical for URL dedup / quotas over web
    * crawls heavy in S3-hosted content).
    *
    * Boundary (declared): WILDCARD PSL rules (`*.compute.amazonaws.com`
    * and friends, where every label under the suffix is itself a suffix)
    * and 4+-label suffixes are NOT modeled — hosts under them group one
    * level too coarse. They are a vanishing slice of crawl traffic;
    * swap in the full PSL with wildcard handling for production use. */
  val threeLabel: Seq[String] = Seq(
    "s3.amazonaws.com",
    "s3-website-us-east-1.amazonaws.com")

  /** Membership sets (for driver-side checks / tests). */
  val twoLabelSet: Set[String] = twoLabel.toSet
  val threeLabelSet: Set[String] = threeLabel.toSet
}
