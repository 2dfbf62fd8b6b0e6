"""LDBC interactive-workload suite (systest/ldbc/test_cases.yaml: 7
IS-short + 12 IC-complex queries).

The LDBC dataset itself isn't vendored in the reference repo, so this
runs at two levels:

- every one of the 19 corpus queries parses, plans, and executes on an
  LDBC-schema graph (multi-var blocks, @recurse over reverse edges,
  shortest with bidirectional edges, facet-ordered expansions — the
  shapes the dataset-scale suite exists to exercise);
- the queries whose pinned answers are closed under a hand-built
  fixture (IS01/03/04/05/06 entity lookups and the IC13 no-path case)
  must reproduce the reference JSON exactly, including facet datetime
  offsets preserved as written (+00:00, not Z).
"""

from __future__ import annotations

import json
import os

import pytest
import yaml

_CASES_PATH = "/root/reference/systest/ldbc/test_cases.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_CASES_PATH),
    reason="reference LDBC corpus not available")

SCHEMA = """
fqid: string @index(hash) @upsert .
id: int @index(int) .
firstName: string @index(hash, term) .
lastName: string @index(hash) .
name: string @index(hash, term) .
birthday: datetime @index(hour) .
creationDate: datetime @index(hour) .
joinDate: datetime .
locationIP: string .
browserUsed: string .
gender: string .
content: string @index(fulltext) .
imageFile: string .
title: string .
email: [string] .
language: [string] .
length: int .
classYear: int .
workFrom: int .
knows: [uid] @reverse @count .
hasCreator: [uid] @reverse @count .
replyOf: uid @reverse @count .
containerOf: [uid] @reverse .
hasModerator: [uid] @reverse .
hasMember: [uid] @reverse .
isLocatedIn: [uid] @reverse .
isSubclassOf: [uid] @reverse .
hasType: [uid] @reverse .
hasTag: [uid] @reverse @count .
hasInterest: [uid] @reverse .
likes: [uid] @reverse .
studyAt: [uid] .
workAt: [uid] .
"""

# IS01/03/04/05/06 entity neighborhoods reconstructed from the pinned
# answers; everything else left empty so open-ended queries stay empty.
FIXTURE = r"""
_:p1 <fqid> "person_4398046514948" .
_:p1 <firstName> "Abhishek" .
_:p1 <lastName> "Roy" .
_:p1 <birthday> "1985-09-06T00:00:00Z" .
_:p1 <locationIP> "27.54.166.12" .
_:p1 <browserUsed> "Internet Explorer" .
_:p1 <gender> "male" .
_:p1 <creationDate> "2010-06-06T23:43:29.643Z" .
_:p1 <isLocatedIn> _:city1 .
_:city1 <id> "231"^^<int> .
_:city1 <name> "Thanjavur" .
_:p933 <fqid> "person_933" .
_:p933 <id> "933"^^<int> .
_:p933 <firstName> "Mahinda" .
_:p933 <lastName> "Perera" .
_:p1 <dgraph.type> "person" .
_:p933 <dgraph.type> "person" .
_:k1 <dgraph.type> "person" .
_:k2 <dgraph.type> "person" .
_:k3 <dgraph.type> "person" .
_:post3 <dgraph.type> "post" .
_:forum1 <dgraph.type> "forum" .
_:p933 <knows> _:k1 (creationDate=2011-11-16T09:47:46.750+00:00) .
_:p933 <knows> _:k2 (creationDate=2011-04-02T21:17:40.919+00:00) .
_:p933 <knows> _:k3 (creationDate=2010-04-08T04:18:41.298+00:00) .
_:k1 <id> "24189255814068"^^<int> .
_:k1 <firstName> "Karl" .
_:k1 <lastName> "Wagner" .
_:k2 <id> "15393162790400"^^<int> .
_:k2 <firstName> "Jose" .
_:k2 <lastName> "Costa" .
_:k3 <id> "2199023256437"^^<int> .
_:k3 <firstName> "Rudolf" .
_:k3 <lastName> "Engel" .
_:post3 <fqid> "post_3" .
_:post3 <creationDate> "2010-02-14T20:30:21.451Z" .
_:post3 <content> "About Rupert Murdoch, alised US citizen iAbout Napoleon, tinuation of the waAbout Ferdinand II of Aragon, (1" .
_:post3 <imageFile> "" .
_:post3 <hasCreator> _:p933 .
_:forum1 <id> "0"^^<int> .
_:forum1 <title> "Wall of Mahinda Perera" .
_:forum1 <containerOf> _:post3 .
_:forum1 <hasModerator> _:p933 .
"""




# Fixture extension closing IS02/IS07/IC04/IC05 under their pinned
# answers (reconstructed from systest/ldbc/test_cases.yaml resp JSON;
# every ordering in those four queries is by explicit sort keys or
# distinct aggregate values, so no uid tie-breaks are involved).
FIXTURE2 = r"""
# IS02: the 10 most recent messages by person_933 (2 comments with
# replyOf chains + 8 empty posts), exactly the pinned first:10 page.
_:c677 <id> "1099511778677"^^<int> .
_:c677 <content> "I see" .
_:c677 <creationDate> "2012-09-12T18:07:52.711Z" .
_:c677 <dgraph.type> "comment" .
_:c677 <hasCreator> _:p933 .
_:c677 <replyOf> _:m673 .
_:m673 <id> "1099511778673"^^<int> .
_:m673 <hasCreator> _:chutima .
_:chutima <id> "19791209303315"^^<int> .
_:chutima <firstName> "Chutima" .
_:chutima <lastName> "Wattansin" .
_:c152 <id> "1099511797152"^^<int> .
_:c152 <content> "About East Germany, state's commitment to communism was a holloAbout Almohad Caliphat" .
_:c152 <creationDate> "2012-09-10T12:39:32.701Z" .
_:c152 <dgraph.type> "comment" .
_:c152 <hasCreator> _:p933 .
_:c152 <replyOf> _:m149 .
_:m149 <id> "1099511797149"^^<int> .
_:m149 <hasCreator> _:farhad .
_:farhad <id> "26388279068783"^^<int> .
_:farhad <firstName> "Farhad" .
_:farhad <lastName> "Qaderi" .
_:pp1099511627881 <id> "1099511627881"^^<int> .
_:pp1099511627881 <content> "" .
_:pp1099511627881 <creationDate> "2012-09-09T20:23:13.268Z" .
_:pp1099511627881 <dgraph.type> "post" .
_:pp1099511627881 <hasCreator> _:p933 .
_:pp1099511627882 <id> "1099511627882"^^<int> .
_:pp1099511627882 <content> "" .
_:pp1099511627882 <creationDate> "2012-09-09T20:23:14.268Z" .
_:pp1099511627882 <dgraph.type> "post" .
_:pp1099511627882 <hasCreator> _:p933 .
_:pp1099511627883 <id> "1099511627883"^^<int> .
_:pp1099511627883 <content> "" .
_:pp1099511627883 <creationDate> "2012-09-09T20:23:15.268Z" .
_:pp1099511627883 <dgraph.type> "post" .
_:pp1099511627883 <hasCreator> _:p933 .
_:pp1099511627884 <id> "1099511627884"^^<int> .
_:pp1099511627884 <content> "" .
_:pp1099511627884 <creationDate> "2012-09-09T20:23:16.268Z" .
_:pp1099511627884 <dgraph.type> "post" .
_:pp1099511627884 <hasCreator> _:p933 .
_:pp1099511627885 <id> "1099511627885"^^<int> .
_:pp1099511627885 <content> "" .
_:pp1099511627885 <creationDate> "2012-09-09T20:23:17.268Z" .
_:pp1099511627885 <dgraph.type> "post" .
_:pp1099511627885 <hasCreator> _:p933 .
_:pp1099511627886 <id> "1099511627886"^^<int> .
_:pp1099511627886 <content> "" .
_:pp1099511627886 <creationDate> "2012-09-09T20:23:18.268Z" .
_:pp1099511627886 <dgraph.type> "post" .
_:pp1099511627886 <hasCreator> _:p933 .
_:pp1099511627887 <id> "1099511627887"^^<int> .
_:pp1099511627887 <content> "" .
_:pp1099511627887 <creationDate> "2012-09-09T20:23:19.268Z" .
_:pp1099511627887 <dgraph.type> "post" .
_:pp1099511627887 <hasCreator> _:p933 .
_:pp1099511627888 <id> "1099511627888"^^<int> .
_:pp1099511627888 <content> "" .
_:pp1099511627888 <creationDate> "2012-09-09T20:23:20.268Z" .
_:pp1099511627888 <dgraph.type> "post" .
_:pp1099511627888 <hasCreator> _:p933 .
# IS07: post_549755864897, its creator, and the 7 pinned replies
# (three repliers know the creator, one does not).
_:post897 <fqid> "post_549755864897" .
_:post897 <hasCreator> _:chris .
_:chris <id> "13194139535450"^^<int> .
_:chris <firstName> "Christopher" .
_:chris <lastName> "Jones" .
_:ouwo <id> "10995116279491"^^<int> .
_:ouwo <firstName> "Ouwo Moussa" .
_:ouwo <lastName> "Maazou" .
_:ouwo <knows> _:chris .
_:abdou <id> "6597069767708"^^<int> .
_:abdou <firstName> "Abdou" .
_:abdou <lastName> "Dia" .
_:abdou <knows> _:chris .
_:ibrahim <id> "2199023256077"^^<int> .
_:ibrahim <firstName> "Ibrahim Bare" .
_:ibrahim <lastName> "Ousmane" .
_:ibrahim <knows> _:chris .
_:bechir <id> "15393162789569"^^<int> .
_:bechir <firstName> "Bechir" .
_:bechir <lastName> "Cardinale" .
_:r549755864902 <id> "549755864902"^^<int> .
_:r549755864902 <content> "About Jan Hus, ech priest, philoAbout Islands in the Stream,  Bend, Indiana raAbout " .
_:r549755864902 <creationDate> "2011-06-23T06:36:48.528Z" .
_:r549755864902 <hasCreator> _:ouwo .
_:r549755864902 <replyOf> _:post897 .
_:r549755864909 <id> "549755864909"^^<int> .
_:r549755864909 <content> "maybe" .
_:r549755864909 <creationDate> "2011-06-22T15:56:44.755Z" .
_:r549755864909 <hasCreator> _:abdou .
_:r549755864909 <replyOf> _:post897 .
_:r549755864900 <id> "549755864900"^^<int> .
_:r549755864900 <content> "yes" .
_:r549755864900 <creationDate> "2011-06-22T13:34:41.791Z" .
_:r549755864900 <hasCreator> _:ibrahim .
_:r549755864900 <replyOf> _:post897 .
_:r549755864904 <id> "549755864904"^^<int> .
_:r549755864904 <content> "About Jan Hus, . Their defenAbout Bob Dylan, er Bob Dylan,About Michael Jordan, majority " .
_:r549755864904 <creationDate> "2011-06-22T10:03:28.337Z" .
_:r549755864904 <hasCreator> _:ouwo .
_:r549755864904 <replyOf> _:post897 .
_:r549755864899 <id> "549755864899"^^<int> .
_:r549755864899 <content> "ok" .
_:r549755864899 <creationDate> "2011-06-22T09:50:14.117Z" .
_:r549755864899 <hasCreator> _:ouwo .
_:r549755864899 <replyOf> _:post897 .
_:r549755864898 <id> "549755864898"^^<int> .
_:r549755864898 <content> "yes" .
_:r549755864898 <creationDate> "2011-06-22T09:34:53.014Z" .
_:r549755864898 <hasCreator> _:abdou .
_:r549755864898 <replyOf> _:post897 .
_:r549755864901 <id> "549755864901"^^<int> .
_:r549755864901 <content> "maybe" .
_:r549755864901 <creationDate> "2011-06-22T07:06:07.735Z" .
_:r549755864901 <hasCreator> _:bechir .
_:r549755864901 <replyOf> _:post897 .
# IC04: six posts by friend k1 inside the (2011-06-10, 2011-10-10)
# window, tagged to produce the pinned new-tag counts 3/2/1.
_:tagMR <name> "Maurice_Ravel" .
_:tagMP <name> "Mohammad_Reza_Pahlavi" .
_:tag99 <name> "99_Problems" .
_:ic4p1 <dgraph.type> "post" .
_:ic4p1 <creationDate> "2011-07-01T00:00:00Z" .
_:ic4p1 <hasCreator> _:k1 .
_:ic4p1 <hasTag> _:tagMR .
_:ic4p2 <dgraph.type> "post" .
_:ic4p2 <creationDate> "2011-07-02T00:00:00Z" .
_:ic4p2 <hasCreator> _:k1 .
_:ic4p2 <hasTag> _:tagMR .
_:ic4p3 <dgraph.type> "post" .
_:ic4p3 <creationDate> "2011-07-03T00:00:00Z" .
_:ic4p3 <hasCreator> _:k1 .
_:ic4p3 <hasTag> _:tagMR .
_:ic4p4 <dgraph.type> "post" .
_:ic4p4 <creationDate> "2011-07-04T00:00:00Z" .
_:ic4p4 <hasCreator> _:k1 .
_:ic4p4 <hasTag> _:tagMP .
_:ic4p5 <dgraph.type> "post" .
_:ic4p5 <creationDate> "2011-07-05T00:00:00Z" .
_:ic4p5 <hasCreator> _:k1 .
_:ic4p5 <hasTag> _:tagMP .
_:ic4p6 <dgraph.type> "post" .
_:ic4p6 <creationDate> "2011-07-06T00:00:00Z" .
_:ic4p6 <hasCreator> _:k1 .
_:ic4p6 <hasTag> _:tag99 .
# IC05: person 102, one friend, one forum joined after the cutoff,
# and the 33 contained posts behind the pinned val(fposts).
_:p102 <dgraph.type> "person" .
_:p102 <id> "102"^^<int> .
_:fA <dgraph.type> "person" .
_:fA <id> "10201"^^<int> .
_:p102 <knows> _:fA .
_:forumB <fqid> "forum_618475321331" .
_:forumB <title> "Group for Buddy_Holly in Aligarh" .
_:forumB <id> "618475321331"^^<int> .
_:forumB <hasMember> _:fA (joinDate=2011-08-01T00:00:00+00:00) .
_:ic5p1 <dgraph.type> "post" .
_:ic5p1 <id> "700001"^^<int> .
_:ic5p1 <creationDate> "2011-08-02T01:00:00Z" .
_:ic5p1 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p1 .
_:ic5p2 <dgraph.type> "post" .
_:ic5p2 <id> "700002"^^<int> .
_:ic5p2 <creationDate> "2011-08-03T02:00:00Z" .
_:ic5p2 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p2 .
_:ic5p3 <dgraph.type> "post" .
_:ic5p3 <id> "700003"^^<int> .
_:ic5p3 <creationDate> "2011-08-04T03:00:00Z" .
_:ic5p3 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p3 .
_:ic5p4 <dgraph.type> "post" .
_:ic5p4 <id> "700004"^^<int> .
_:ic5p4 <creationDate> "2011-08-05T04:00:00Z" .
_:ic5p4 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p4 .
_:ic5p5 <dgraph.type> "post" .
_:ic5p5 <id> "700005"^^<int> .
_:ic5p5 <creationDate> "2011-08-06T05:00:00Z" .
_:ic5p5 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p5 .
_:ic5p6 <dgraph.type> "post" .
_:ic5p6 <id> "700006"^^<int> .
_:ic5p6 <creationDate> "2011-08-07T06:00:00Z" .
_:ic5p6 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p6 .
_:ic5p7 <dgraph.type> "post" .
_:ic5p7 <id> "700007"^^<int> .
_:ic5p7 <creationDate> "2011-08-08T07:00:00Z" .
_:ic5p7 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p7 .
_:ic5p8 <dgraph.type> "post" .
_:ic5p8 <id> "700008"^^<int> .
_:ic5p8 <creationDate> "2011-08-09T08:00:00Z" .
_:ic5p8 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p8 .
_:ic5p9 <dgraph.type> "post" .
_:ic5p9 <id> "700009"^^<int> .
_:ic5p9 <creationDate> "2011-08-10T09:00:00Z" .
_:ic5p9 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p9 .
_:ic5p10 <dgraph.type> "post" .
_:ic5p10 <id> "700010"^^<int> .
_:ic5p10 <creationDate> "2011-08-11T00:00:00Z" .
_:ic5p10 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p10 .
_:ic5p11 <dgraph.type> "post" .
_:ic5p11 <id> "700011"^^<int> .
_:ic5p11 <creationDate> "2011-08-12T01:00:00Z" .
_:ic5p11 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p11 .
_:ic5p12 <dgraph.type> "post" .
_:ic5p12 <id> "700012"^^<int> .
_:ic5p12 <creationDate> "2011-08-13T02:00:00Z" .
_:ic5p12 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p12 .
_:ic5p13 <dgraph.type> "post" .
_:ic5p13 <id> "700013"^^<int> .
_:ic5p13 <creationDate> "2011-08-14T03:00:00Z" .
_:ic5p13 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p13 .
_:ic5p14 <dgraph.type> "post" .
_:ic5p14 <id> "700014"^^<int> .
_:ic5p14 <creationDate> "2011-08-15T04:00:00Z" .
_:ic5p14 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p14 .
_:ic5p15 <dgraph.type> "post" .
_:ic5p15 <id> "700015"^^<int> .
_:ic5p15 <creationDate> "2011-08-16T05:00:00Z" .
_:ic5p15 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p15 .
_:ic5p16 <dgraph.type> "post" .
_:ic5p16 <id> "700016"^^<int> .
_:ic5p16 <creationDate> "2011-08-17T06:00:00Z" .
_:ic5p16 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p16 .
_:ic5p17 <dgraph.type> "post" .
_:ic5p17 <id> "700017"^^<int> .
_:ic5p17 <creationDate> "2011-08-18T07:00:00Z" .
_:ic5p17 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p17 .
_:ic5p18 <dgraph.type> "post" .
_:ic5p18 <id> "700018"^^<int> .
_:ic5p18 <creationDate> "2011-08-19T08:00:00Z" .
_:ic5p18 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p18 .
_:ic5p19 <dgraph.type> "post" .
_:ic5p19 <id> "700019"^^<int> .
_:ic5p19 <creationDate> "2011-08-20T09:00:00Z" .
_:ic5p19 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p19 .
_:ic5p20 <dgraph.type> "post" .
_:ic5p20 <id> "700020"^^<int> .
_:ic5p20 <creationDate> "2011-08-21T00:00:00Z" .
_:ic5p20 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p20 .
_:ic5p21 <dgraph.type> "post" .
_:ic5p21 <id> "700021"^^<int> .
_:ic5p21 <creationDate> "2011-08-22T01:00:00Z" .
_:ic5p21 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p21 .
_:ic5p22 <dgraph.type> "post" .
_:ic5p22 <id> "700022"^^<int> .
_:ic5p22 <creationDate> "2011-08-23T02:00:00Z" .
_:ic5p22 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p22 .
_:ic5p23 <dgraph.type> "post" .
_:ic5p23 <id> "700023"^^<int> .
_:ic5p23 <creationDate> "2011-08-24T03:00:00Z" .
_:ic5p23 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p23 .
_:ic5p24 <dgraph.type> "post" .
_:ic5p24 <id> "700024"^^<int> .
_:ic5p24 <creationDate> "2011-08-25T04:00:00Z" .
_:ic5p24 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p24 .
_:ic5p25 <dgraph.type> "post" .
_:ic5p25 <id> "700025"^^<int> .
_:ic5p25 <creationDate> "2011-08-26T05:00:00Z" .
_:ic5p25 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p25 .
_:ic5p26 <dgraph.type> "post" .
_:ic5p26 <id> "700026"^^<int> .
_:ic5p26 <creationDate> "2011-08-27T06:00:00Z" .
_:ic5p26 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p26 .
_:ic5p27 <dgraph.type> "post" .
_:ic5p27 <id> "700027"^^<int> .
_:ic5p27 <creationDate> "2011-08-28T07:00:00Z" .
_:ic5p27 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p27 .
_:ic5p28 <dgraph.type> "post" .
_:ic5p28 <id> "700028"^^<int> .
_:ic5p28 <creationDate> "2011-08-01T08:00:00Z" .
_:ic5p28 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p28 .
_:ic5p29 <dgraph.type> "post" .
_:ic5p29 <id> "700029"^^<int> .
_:ic5p29 <creationDate> "2011-08-02T09:00:00Z" .
_:ic5p29 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p29 .
_:ic5p30 <dgraph.type> "post" .
_:ic5p30 <id> "700030"^^<int> .
_:ic5p30 <creationDate> "2011-08-03T00:00:00Z" .
_:ic5p30 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p30 .
_:ic5p31 <dgraph.type> "post" .
_:ic5p31 <id> "700031"^^<int> .
_:ic5p31 <creationDate> "2011-08-04T01:00:00Z" .
_:ic5p31 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p31 .
_:ic5p32 <dgraph.type> "post" .
_:ic5p32 <id> "700032"^^<int> .
_:ic5p32 <creationDate> "2011-08-05T02:00:00Z" .
_:ic5p32 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p32 .
_:ic5p33 <dgraph.type> "post" .
_:ic5p33 <id> "700033"^^<int> .
_:ic5p33 <creationDate> "2011-08-06T03:00:00Z" .
_:ic5p33 <hasCreator> _:fA .
_:forumB <containerOf> _:ic5p33 .
"""


@pytest.fixture(scope="module")
def ldbc_graph(spark):
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    lines = spark.createDataFrame(
        [(ln,) for ln in (FIXTURE + FIXTURE2).splitlines()
         if ln.strip() and not ln.lstrip().startswith("#")], "value string")
    reg = SchemaRegistry.parse(SCHEMA)
    g = graph_from_triples(spark, parse_nquads(lines), reg)
    for t in ("person", "post", "comment", "forum", "tag", "tagclass",
              "place", "organisation"):
        g.schema.define_type(t, [])
    return g


def _cases():
    return yaml.safe_load(open(_CASES_PATH))


@pytest.mark.slow
def test_ldbc_corpus_executes(ldbc_graph):
    """All 19 LDBC IS/IC queries parse, plan, and execute."""
    from dgraph_spark.plans import Executor

    errors = []
    for name, c in _cases().items():
        try:
            Executor(ldbc_graph).execute(c["query"])
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name} ({c.get('tag')}): {type(e).__name__}: {e}")
    assert errors == []


_EXACT = {"q1": "IS01", "q2": "IS02", "q3": "IS03", "q4": "IS04",
          "q5": "IS05", "q6": "IS06", "q7": "IS07", "q10": "IC04",
          "q11": "IC05", "q19": "IC13"}


@pytest.mark.parametrize("qname", sorted(_EXACT))
def test_ldbc_pinned_answers(ldbc_graph, qname):
    """Fixture-closed cases reproduce the reference's pinned JSON —
    including knows-edge facet datetimes rendered with their original
    +00:00 offsets."""
    from dgraph_spark.plans import Executor

    c = _cases()[qname]
    got = Executor(ldbc_graph).execute(c["query"])
    want = json.loads(c["resp"])
    assert got == want, f"{qname} ({c['tag']})"


# ===================================================================
# Per-query synthesized fixtures for the 9 IC cases whose pinned
# answers aren't closed by the shared fixture above: each builds a
# STANDALONE graph from the pinned resp (tests/ldbc_fixtures.py) and
# must reproduce the reference JSON exactly.
# ===================================================================

import tests.ldbc_fixtures as _fx


def _standalone_graph(spark, lines):
    from dgraph_spark.schema import SchemaRegistry
    from dgraph_spark.sources.rdf import graph_from_triples, parse_nquads

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    g = graph_from_triples(spark, parse_nquads(df), SchemaRegistry.parse(SCHEMA))
    for t in ("person", "post", "comment", "forum", "tag", "tagclass",
              "place", "organisation"):
        g.schema.define_type(t, [])
    return g


def _check_synth(spark, qname):
    from dgraph_spark.plans import Executor

    c = _cases()[qname]
    want = json.loads(c["resp"])
    lines = getattr(_fx, f"fx_{qname}")(want)
    g = _standalone_graph(spark, lines)
    got = Executor(g).execute(c["query"])
    assert got == want, f"{qname} ({c['tag']})"


@pytest.mark.parametrize("qname", ["q9", "q14", "q15"])
def test_ldbc_synth_message_pages(spark, qname):
    """IC02/IC08/IC09: 20-row message pages ordered (creationDate desc,
    id-or-fqid asc), closed under synthesized creator/message graphs."""
    _check_synth(spark, qname)


@pytest.mark.parametrize("qname", [
    pytest.param("q13", marks=pytest.mark.slow), "q12", "q16", "q18"])
def test_ldbc_synth_ranked_aggregates(spark, qname):
    """IC07/IC06/IC10/IC12: like-pages with facet rendering, co-tag
    counts, interest scores (count-of-empty == 0), and reply-count
    rankings — order ties pinned by uid allocation order."""
    _check_synth(spark, qname)


@pytest.mark.parametrize("qname", [
    pytest.param("q8", marks=pytest.mark.slow), "q17"])
def test_ldbc_synth_friend_networks(spark, qname):
    """IC01/IC11: 14-pattern 3-hop distance classification (fixture
    self-checked by an independent dict-BFS in ldbc_fixtures) and
    Sri-Lanka employer lookup with string workFrom facets."""
    _check_synth(spark, qname)
